"""`python -m krep_tpu` == the krep-compatible CLI (cli.main)."""

import sys

from .cli import main

sys.exit(main())
