from . import csv_clean, generators  # noqa: F401
