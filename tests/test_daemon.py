"""Resident-engine daemon (krep_tpu/daemon.py) + native client protocol:
the same invocation through the daemon must produce byte-identical
stdout/stderr and the same rc as the in-process CLI. The daemon exists to
restore the reference C binary's ~ms startup (krep.c's zero-cost process
model) for a Python+JAX engine; correctness must not depend on which path
served the query."""

from __future__ import annotations

import io
import os
import socket
import struct
import subprocess
import sys
import time

import pytest

import naive
from krep_tpu import cli
from krep_tpu import daemon as kd

pytestmark = pytest.mark.skipif(
    not hasattr(socket, "send_fds"), reason="needs socket.send_fds (3.9+)"
)


@pytest.fixture(scope="module")
def live_daemon(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("daemon")
    sock = str(tmp_path / "d.sock")
    env = dict(os.environ)
    env["KREP_TPU_DAEMON_WARM_JAX"] = "0"  # keep the test light
    proc = subprocess.Popen(
        [sys.executable, "-m", "krep_tpu.daemon", "--foreground",
         "--sock", sock, "--idle", "120"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stderr=subprocess.PIPE,
    )
    deadline = time.time() + 30
    while not os.path.exists(sock):
        if proc.poll() is not None:
            raise RuntimeError(proc.stderr.read().decode())
        if time.time() > deadline:
            proc.kill()
            raise TimeoutError("daemon did not come up")
        time.sleep(0.05)
    yield sock
    kd.stop(sock)
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()


def request(sock_path, argv, cwd=None, stdin=b"", env=None):
    """Python twin of native/client.c: send argv+cwd+env with the three
    fds over SCM_RIGHTS, return (stdout, stderr, rc)."""
    r_in, w_in = os.pipe()
    r_out, w_out = os.pipe()
    r_err, w_err = os.pipe()
    os.write(w_in, stdin)
    os.close(w_in)

    payload = struct.pack("<I", len(argv))
    payload += (cwd or os.getcwd()).encode() + b"\x00"
    for a in argv:
        payload += a.encode() + b"\x00"
    items = sorted((env or {}).items())
    payload += struct.pack("<I", len(items))
    for k, v in items:
        payload += f"{k}={v}".encode() + b"\x00"
    hdr = kd.MAGIC_REQ + struct.pack("<IQ", kd.VERSION, len(payload))

    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.connect(sock_path)
    socket.send_fds(s, [hdr], [r_in, w_out, w_err])
    os.close(r_in), os.close(w_out), os.close(w_err)
    s.sendall(payload)

    out = err = b""
    # daemon holds the only write ends now; read to EOF then collect rc
    with os.fdopen(r_out, "rb") as f:
        out = f.read()
    with os.fdopen(r_err, "rb") as f:
        err = f.read()
    resp = b""
    while len(resp) < 8:
        b = s.recv(8 - len(resp))
        if not b:
            break
        resp += b
    s.close()
    assert resp[:4] == kd.MAGIC_RESP, resp
    (rc,) = struct.unpack("<i", resp[4:8])
    return out, err, rc


def inproc(argv, stdin=None):
    buf = io.BytesIO()
    old_stdin = sys.stdin
    if stdin is not None:
        class _S:
            buffer = io.BytesIO(stdin)
        sys.stdin = _S()
    try:
        rc = cli.main(list(argv), out=buf)
    finally:
        sys.stdin = old_stdin
    return buf.getvalue(), rc


def test_daemon_matches_inprocess(live_daemon, tmp_path):
    text = naive.gen_english(17, 20_000)
    p = tmp_path / "t.txt"
    p.write_bytes(text)
    for argv in (
        ["-c", "the", str(p)],
        ["the", str(p)],
        ["-o", "-i", "THE", str(p)],
        ["-w", "-c", "the", str(p)],
        ["-e", "the", "-e", "fox", "-c", str(p)],
        ["--color=always", "the", str(p)],
        ["-c", "zzzz", str(p)],
    ):
        # host route ON in both paths: the daemon's value is startup
        # amortization, and the route keeps a fresh daemon process from
        # paying a full XLA compile per argset (the device path's own
        # parity is the rest of the suite's job)
        os.environ["KREP_TPU_HOST_BREAKEVEN"] = str(32 << 20)
        try:
            want_out, want_rc = inproc(argv)
        finally:
            os.environ["KREP_TPU_HOST_BREAKEVEN"] = "0"
        got_out, got_err, got_rc = request(
            live_daemon, argv, env={"KREP_TPU_HOST_BREAKEVEN": str(32 << 20)}
        )
        assert got_out == want_out and got_rc == want_rc, argv


def test_daemon_stdin_and_cwd(live_daemon, tmp_path):
    host_on = {"KREP_TPU_HOST_BREAKEVEN": str(32 << 20)}
    text = b"the cat\nthe dog\nno match here\n"
    os.environ["KREP_TPU_HOST_BREAKEVEN"] = host_on["KREP_TPU_HOST_BREAKEVEN"]
    try:
        want_out, want_rc = inproc(["-c", "the"], stdin=text)
    finally:
        os.environ["KREP_TPU_HOST_BREAKEVEN"] = "0"
    got_out, _, got_rc = request(live_daemon, ["-c", "the"], stdin=text,
                                 env=host_on)
    assert got_out == want_out and got_rc == want_rc
    # relative path resolves against the CLIENT's cwd
    (tmp_path / "rel.txt").write_bytes(text)
    got_out, _, got_rc = request(
        live_daemon, ["-c", "the", "rel.txt"], cwd=str(tmp_path), env=host_on
    )
    assert got_out == b"rel.txt:2\n" and got_rc == 0


def test_daemon_error_paths(live_daemon, tmp_path):
    # bad option: stderr + usage on stdout + rc 2, same as in-process
    want_out, want_rc = inproc(["--frobnicate", "x", "f"])
    got_out, got_err, got_rc = request(live_daemon, ["--frobnicate", "x", "f"])
    assert got_rc == want_rc == 2
    assert got_out == want_out
    assert b"unrecognized option" in got_err
    # missing file
    argv = ["-c", "x", str(tmp_path / "nope.txt")]
    want_out, want_rc = inproc(argv)
    got_out, _, got_rc = request(
        live_daemon, argv, env={"KREP_TPU_HOST_BREAKEVEN": str(32 << 20)}
    )
    assert got_out == want_out and got_rc == want_rc == 2


def test_daemon_env_is_per_request(live_daemon, tmp_path):
    p = tmp_path / "t.txt"
    p.write_bytes(b"aaa bbb aaa\n")
    # PROFILE=1 logs the routing decision to the client's stderr only for
    # the request that asked for it
    _, err1, _ = request(
        live_daemon, ["-c", "aaa", str(p)],
        env={"KREP_TPU_HOST_BREAKEVEN": str(32 << 20), "KREP_TPU_PROFILE": "1"},
    )
    assert b"host route" in err1
    _, err2, _ = request(
        live_daemon, ["-c", "aaa", str(p)],
        env={"KREP_TPU_HOST_BREAKEVEN": str(32 << 20)},
    )
    assert b"host route" not in err2


def test_daemon_stop(tmp_path):
    sock = str(tmp_path / "s.sock")
    env = dict(os.environ)
    env["KREP_TPU_DAEMON_WARM_JAX"] = "0"
    proc = subprocess.Popen(
        [sys.executable, "-m", "krep_tpu.daemon", "--foreground",
         "--sock", sock, "--idle", "120"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    deadline = time.time() + 30
    while not os.path.exists(sock):
        assert proc.poll() is None
        assert time.time() < deadline
        time.sleep(0.05)
    assert kd.stop(sock) == 0
    proc.wait(timeout=15)
    assert proc.returncode == 0
    assert not os.path.exists(sock)


def test_native_client_end_to_end(live_daemon, tmp_path):
    """Through the real C client when it's built (make client)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    client = os.path.join(root, "bin", "krep-tpu")
    if not os.path.exists(client):
        r = subprocess.run(["make", "-s", "client"], cwd=root,
                           capture_output=True)
        if r.returncode != 0 or not os.path.exists(client):
            pytest.skip("client binary unavailable")
    text = naive.gen_english(23, 15_000)
    p = tmp_path / "t.txt"
    p.write_bytes(text)
    env = dict(os.environ)
    env["KREP_TPU_DAEMON_SOCK"] = live_daemon
    env["KREP_TPU_DAEMON_AUTOSPAWN"] = "0"
    env["KREP_TPU_HOST_BREAKEVEN"] = str(32 << 20)
    for argv in (["-c", "the"], ["-o", "the"], ["-i", "-w", "THE"]):
        os.environ["KREP_TPU_HOST_BREAKEVEN"] = str(32 << 20)
        try:
            want_out, want_rc = inproc(argv + [str(p)])
        finally:
            os.environ["KREP_TPU_HOST_BREAKEVEN"] = "0"
        r = subprocess.run([client] + argv + [str(p)], env=env,
                           capture_output=True, timeout=120)
        assert r.stdout == want_out and r.returncode == want_rc, argv
