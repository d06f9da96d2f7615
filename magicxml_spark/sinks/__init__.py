"""Sinks (SURVEY.md §2.2): CSV (BOM/single-file modes), YML & simple
XML, JSON (array/envelope), Excel (driver-side, bounded), webhook,
download path guard."""
