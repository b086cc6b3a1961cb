"""Shim for ``globalign.globaligner`` (reference globaligner.py:23-314)."""

from globalign_tpu.api import find_global_alignment  # noqa: F401
from globalign_tpu.cli import main  # noqa: F401
