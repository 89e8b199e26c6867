"""Ingestion and persistence: FASTA, UniProt flat files, shard manifests."""

from .fasta import Database, Query, parse_database, parse_query, write_fasta  # noqa: F401
