"""Resident engine daemon: the framework's answer to C-binary startup cost.

The reference is a C binary whose small-file regime costs one
open+read+scan with zero startup (krep.c:3402-3430). A Python+JAX process
pays ~1.9s of interpreter+import before the first byte is scanned — two
orders of magnitude over the whole reference query. The fix is the
standard one for accelerator-backed serving (bazel/watchman/gradle): a
resident engine holding the warm interpreter (and, lazily, the warm JAX
client + compiled kernels), fronted by a ~1ms native client
(native/client.c).

Protocol (AF_UNIX SOCK_STREAM, one request per connection):

  client -> server, first sendmsg carries SCM_RIGHTS [stdin, stdout,
  stderr] plus a 16-byte header:  magic b"KRPD" | u32 version | u64
  payload_len, then payload bytes (possibly across further sends):

      u32 argc
      cwd  NUL-terminated
      argc args, each NUL-terminated
      u32 nenv
      nenv "KEY=VALUE" entries, each NUL-terminated

  server -> client after the request completes: b"KRPR" | i32 rc.

Passing the real fds (not buffered pipes) makes output streaming,
`isatty` (and so --color=auto), stdin consumption, and SIGPIPE behavior
identical to running the CLI directly — the daemon writes to the
client's own terminal/pipe.

Requests are served sequentially: cwd and env are process-global, and a
single request already fans out across devices/threads internally.
Import-time knobs (KREP_TPU_STRICT) are fixed at daemon start; routing
knobs (KREP_TPU_HOST_BREAKEVEN, KREP_TPU_PROFILE, ...) are applied
per-request from the client's environment.

Run: python -m krep_tpu.daemon [--sock PATH] [--idle SECS] [--foreground]
Stop: python -m krep_tpu.daemon --stop   (or just let it idle out)
"""

from __future__ import annotations

import argparse
import io
import os
import socket
import struct
import sys
import threading

MAGIC_REQ = b"KRPD"
MAGIC_STOP = b"KRPX"
MAGIC_RESP = b"KRPR"
VERSION = 1
MAX_PAYLOAD = 16 << 20  # argv+env; far beyond any real command line
DEFAULT_IDLE_S = 900.0


def default_sock_path() -> str:
    env = os.environ.get("KREP_TPU_DAEMON_SOCK")
    if env:
        return env
    cache = os.environ.get(
        "KREP_TPU_CACHE_DIR", os.path.expanduser("~/.cache/krep_tpu")
    )
    return os.path.join(cache, f"daemon-{os.getuid()}.sock")


class _OutShim(io.RawIOBase):
    """sys.stdout stand-in over the client's fd: cli.main only needs
    .isatty() (--color=auto) and .buffer (default out target)."""

    def __init__(self, fd: int):
        super().__init__()
        self._fd = fd
        self.buffer = io.BufferedWriter(io.FileIO(fd, "wb", closefd=False))

    def isatty(self) -> bool:
        try:
            return os.isatty(self._fd)
        except OSError:
            return False

    def write(self, s):
        data = s.encode() if isinstance(s, str) else s
        self.buffer.write(data)
        return len(s)

    def flush(self):
        self.buffer.flush()


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        b = conn.recv(min(n, 1 << 16))
        if not b:
            raise ConnectionError("client hung up mid-request")
        chunks.append(b)
        n -= len(b)
    return b"".join(chunks)


def _parse_payload(payload: bytes):
    off = 0

    def u32():
        nonlocal off
        (v,) = struct.unpack_from("<I", payload, off)
        off += 4
        return v

    def cstr():
        nonlocal off
        end = payload.index(b"\x00", off)
        s = payload[off:end]
        off = end + 1
        return s

    argc = u32()
    if argc > 4096:
        raise ValueError("argc too large")
    cwd = cstr()
    args = [cstr().decode("utf-8", "surrogateescape") for _ in range(argc)]
    nenv = u32()
    if nenv > 4096:
        raise ValueError("nenv too large")
    env = {}
    for _ in range(nenv):
        k, _, v = cstr().decode("utf-8", "surrogateescape").partition("=")
        env[k] = v
    return cwd, args, env


# env keys the daemon honors per-request (routing/profiling knobs; cheap,
# read at call time). Import-time knobs are fixed at daemon start.
_REQUEST_ENV_PREFIX = "KREP_TPU_"


def serve_request(conn: socket.socket) -> bool:
    """Handle one request; returns True when the client asked the daemon
    to shut down (magic KRPX)."""
    from . import cli

    # header + fds arrive together on the first recvmsg
    hdr, fds, _, _ = socket.recv_fds(conn, 16, 3)
    try:
        if len(hdr) < 16:
            hdr += _recv_exact(conn, 16 - len(hdr))
        magic, ver, plen = struct.unpack("<4sIQ", hdr)
        if magic == MAGIC_STOP:
            conn.sendall(MAGIC_RESP + struct.pack("<i", 0))
            return True
        if magic != MAGIC_REQ or ver != VERSION:
            raise ValueError(f"bad request header {magic!r} v{ver}")
        if plen > MAX_PAYLOAD:
            raise ValueError("payload too large")
        if len(fds) != 3:
            raise ValueError(f"expected 3 fds, got {len(fds)}")
        cwd, args, env = _parse_payload(_recv_exact(conn, plen))

        saved_env = {
            k: os.environ.get(k)
            for k in set(env) | {
                k for k in os.environ if k.startswith(_REQUEST_ENV_PREFIX)
            }
        }
        old_stdin, old_stdout, old_stderr = sys.stdin, sys.stdout, sys.stderr
        rc = 2
        try:
            os.chdir(cwd)
            for k in saved_env:
                os.environ.pop(k, None)
            os.environ.update(env)
            # hostscan caches the calibrated threshold; per-request env
            # overrides must see a fresh read
            try:
                from .ops import hostscan

                hostscan._threshold_cache = None
            except Exception:
                pass

            sys.stdin = io.TextIOWrapper(
                io.BufferedReader(io.FileIO(fds[0], "rb", closefd=False))
            )
            out = _OutShim(fds[1])
            sys.stdout = out
            sys.stderr = io.TextIOWrapper(
                io.FileIO(fds[2], "wb", closefd=False), write_through=True
            )
            try:
                rc = cli.main(args, out=out.buffer)
                out.flush()
            except BrokenPipeError:
                rc = 141  # downstream closed (e.g. `| head`) == SIGPIPE death
            except SystemExit as e:
                rc = int(e.code or 0)
            except Exception:
                import traceback

                try:
                    traceback.print_exc(file=sys.stderr)
                except OSError:
                    pass
                rc = 2
        finally:
            sys.stdin, sys.stdout, sys.stderr = old_stdin, old_stdout, old_stderr
            for k, v in saved_env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        try:
            conn.sendall(MAGIC_RESP + struct.pack("<i", rc))
        except OSError:
            pass
    finally:
        for fd in fds:
            try:
                os.close(fd)
            except OSError:
                pass


def _warm_background() -> None:
    """Pre-import the heavy stacks off the accept loop so the first large
    (device-routed) query doesn't pay the 1.6s jax import."""

    def _go():
        try:
            from .native import runtime  # noqa: F401  (builds the .so)
        except Exception:
            pass
        try:
            if os.environ.get("KREP_TPU_DAEMON_WARM_JAX", "1") != "0":
                import jax  # noqa: F401
        except Exception:
            pass

    threading.Thread(target=_go, name="krep-warm", daemon=True).start()


def _try_connect(path: str) -> socket.socket | None:
    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    try:
        s.settimeout(2.0)
        s.connect(path)
        return s
    except OSError:
        s.close()
        return None


def serve(sock_path: str, idle_s: float = DEFAULT_IDLE_S) -> int:
    os.makedirs(os.path.dirname(sock_path) or ".", exist_ok=True)
    if os.path.exists(sock_path):
        if _try_connect(sock_path) is not None:
            sys.stderr.write(f"krep-tpu daemon: already running at {sock_path}\n")
            return 0
        os.unlink(sock_path)  # stale socket from a dead daemon

    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    try:
        srv.bind(sock_path)
        os.chmod(sock_path, 0o600)
        srv.listen(16)
        srv.settimeout(idle_s)
        _warm_background()
        while True:
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                break  # idle out
            except OSError:
                break
            stop_requested = False
            with conn:
                try:
                    stop_requested = serve_request(conn)
                except Exception as e:
                    sys.stderr.write(f"krep-tpu daemon: request failed: {e}\n")
            if stop_requested:
                break
        return 0
    finally:
        srv.close()
        try:
            os.unlink(sock_path)
        except OSError:
            pass


def stop(sock_path: str) -> int:
    """Ask a running daemon to exit (magic KRPX; the daemon acks with rc 0,
    closes its socket, and leaves the accept loop)."""
    s = _try_connect(sock_path)
    if s is None:
        sys.stderr.write("krep-tpu daemon: not running\n")
        return 0
    with s:
        s.sendall(MAGIC_STOP + struct.pack("<IQ", VERSION, 0))
        try:
            s.recv(8)
        except OSError:
            pass
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="krep-tpu-daemon", description=__doc__)
    ap.add_argument("--sock", default=default_sock_path())
    ap.add_argument("--idle", type=float, default=DEFAULT_IDLE_S,
                    help="exit after this many idle seconds")
    ap.add_argument("--foreground", action="store_true",
                    help="serve in this process (default: double-fork)")
    ap.add_argument("--stop", action="store_true")
    ns = ap.parse_args(argv)

    if ns.stop:
        return stop(ns.sock)
    if ns.foreground:
        return serve(ns.sock, ns.idle)

    # daemonize: double-fork + setsid, then serve
    if os.fork():
        return 0
    os.setsid()
    if os.fork():
        os._exit(0)
    devnull = os.open(os.devnull, os.O_RDWR)
    os.dup2(devnull, 0)
    os.dup2(devnull, 1)
    os.dup2(devnull, 2)
    os._exit(serve(ns.sock, ns.idle))


if __name__ == "__main__":
    sys.exit(main())
