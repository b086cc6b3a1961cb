"""Repo-root conftest: make the in-tree package importable without install."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
