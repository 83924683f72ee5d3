"""`python -m pdfplumber_rs_spark` entry point (S8 CLI sinks)."""

import sys

from .cli import main

sys.exit(main())
