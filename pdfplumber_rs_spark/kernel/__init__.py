"""Pure-Python/numpy PDF extraction kernel.

This subpackage has no Spark dependency: it is the per-document batch
kernel executed inside ``mapInArrow``/``applyInPandas`` on executors.
Semantics follow the reference (developer0hye/pdfplumber-rs), which in
turn follows Python pdfplumber.
"""
