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

__all__ = [
    "build_catalog", "compile_catalog", "OracleDecoder",
    # stage combinators (engine.stages): parse_stage, enrich_stage,
    # decode_route_stage, fused_stage, aggregate_stage, pre_aggregated,
    # aggregate_salted — imported lazily to keep `import engine` light
]


def __getattr__(name):
    import importlib
    for mod in ("stages", "pipeline", "sources", "export", "queries",
                "dedup", "simsearch", "text", "multimodal", "catalog_query"):
        m = importlib.import_module(f"engine.{mod}")
        if hasattr(m, name):
            return getattr(m, name)
    raise AttributeError(name)
