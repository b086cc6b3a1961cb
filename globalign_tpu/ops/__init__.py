from . import fill_scan, traceback, transforms

__all__ = ["fill_scan", "traceback", "transforms"]
