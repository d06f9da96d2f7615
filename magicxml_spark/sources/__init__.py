"""Sources (SURVEY.md §2.1): XML dialects, CSV sniffing, JSON root
discovery, Excel, PDF/image binary (import-gated)."""
