"""Ray-Data-native telemetry parse -> enrich -> route -> aggregate engine.

A from-scratch re-expression of the NR5G log-parser reference
(tmultani945/log_parser_project, read-only at /root/reference) as Ray Data
pipelines over Parquet tables of pre-tokenized sequences
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``.

Public surface (mirrors the reference's package-root re-exports,
hex_decoder_module/__init__.py:1-22):
"""

from engine.catalog import build_catalog, compile_catalog
from engine.oracle import OracleDecoder

__all__ = ["build_catalog", "compile_catalog", "OracleDecoder"]
