from . import fill_rows, fill_scan, linear_tb, traceback, transforms

__all__ = ["fill_rows", "fill_scan", "linear_tb", "traceback", "transforms"]
