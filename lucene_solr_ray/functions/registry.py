"""User-extension registries (SURVEY.md §2.12).

The reference's SPI surfaces (`TokenizerFactory`/`TokenFilterFactory` loadable
by name, `UpdateRequestProcessorChain` ingest middleware, `QParserPlugin` /
`ValueSourceParser` registries) map to plain name -> callable registries here;
a pipeline step is any batch callable (stateless task) or callable class
(actor-pool stage) composable into ``Dataset.map_batches``.

Built-ins are pre-registered; users add their own with ``register(kind, name,
obj)`` and build chains with :func:`ingest_chain`.
"""

from __future__ import annotations

from collections.abc import Callable

_REGISTRY: dict[str, dict[str, object]] = {
    "tokenizer": {},
    "token_filter": {},
    "stage": {},
    "query_parser": {},
    "scalar_fn": {},
    # media decode callables for the multimodal stages (ImageDecoder /
    # FrameSampler): a cluster with PIL/ffmpeg registers its real decoder
    # here (or in a module named via codec_module, imported worker-side)
    "codec": {},
}


def register(kind: str, name: str, obj) -> None:
    if kind not in _REGISTRY:
        raise KeyError(f"unknown registry kind {kind!r}; have {sorted(_REGISTRY)}")
    _REGISTRY[kind][name] = obj


def lookup(kind: str, name: str):
    try:
        return _REGISTRY[kind][name]
    except KeyError:
        raise KeyError(f"no {kind} named {name!r}; have {sorted(_REGISTRY.get(kind, ()))}") from None


def names(kind: str) -> list[str]:
    return sorted(_REGISTRY[kind])


def ingest_chain(ds, steps: list, **map_batches_kwargs):
    """UpdateRequestProcessorChain analog: apply named/inline stages in order.

    ``steps``: each item is a registered stage name, a callable, or a
    ``(callable, kwargs)`` pair — applied as ``map_batches(...,
    batch_format="pyarrow")`` in sequence.
    """
    for step in steps:
        fn_kwargs = {}
        if isinstance(step, tuple):
            step, fn_kwargs = step
        if isinstance(step, str):
            step = lookup("stage", step)
        ds = ds.map_batches(
            step, batch_format="pyarrow", fn_kwargs=fn_kwargs or None, **map_batches_kwargs
        )
    return ds


def _register_builtins() -> None:
    from ..analysis import tokenizer as tok
    from ..stages import dedup, extract, signatures, textstats, tokenize

    register("tokenizer", "standard", tok.analyze)
    register("tokenizer", "simple", tok.simple_tokenize)

    from ..analysis import filters as flt

    # TokenFilterFactory analog (loadable-by-name filter library)
    register("token_filter", "ascii_folding", flt.ascii_fold)
    register("token_filter", "porter_stem", flt.porter_stem)
    register("token_filter", "shingle", flt.shingle_tokens)
    register("token_filter", "ngram", flt.ngram_terms)
    register("token_filter", "edge_ngram", flt.edge_ngram_terms)
    register("token_filter", "synonym", flt.synonym_expand)
    register("token_filter", "stop", flt.stop_filter)
    register("stage", "extract_html", extract.extract_batch)
    register("stage", "tokenize", tokenize.tokenize_batch)
    register("stage", "signature_md5", signatures.md5_signature_batch)
    register("stage", "signature_lookup3", signatures.lookup3_signature_batch)
    register("stage", "signature_textprofile", signatures.text_profile_signature_batch)
    register("stage", "content_hash", dedup.add_content_hash)
    register("stage", "simhash", dedup.simhash_batch)
    register("stage", "language_id", textstats.LanguageId)

    from ..stages import processors as up

    # field-mutating update processors (UpdateRequestProcessorFactory battery)
    for pname in (
        "trim_fields", "regex_replace", "truncate_field", "concat_fields",
        "field_length", "parse_numeric", "parse_date", "clone_field",
        "count_field_values", "first_field_value", "max_field_value",
        "min_field_value", "remove_blank", "default_value", "content_uuid",
    ):
        register("stage", pname, getattr(up, pname))
    register("stage", "token_count", textstats.token_count_batch)
    register("stage", "quality_score", textstats.quality_score_batch)
    register("stage", "fingerprint", textstats.fingerprint_batch)

    from ..query.edismax import EDisMaxParser
    from ..query.parser import QueryParser

    register("query_parser", "classic", QueryParser)
    register("query_parser", "edismax", EDisMaxParser)

    import numpy as np
    import pyarrow.compute as pc

    # ValueSourceParser surface (math/logic kernels over pc/numpy)
    for name, fn in {
        "sqrt": pc.sqrt, "abs": pc.abs, "floor": pc.floor, "ceil": pc.ceil,
        "ln": pc.ln, "exp": pc.exp, "sin": pc.sin, "cos": pc.cos,
        "sum": pc.add, "sub": pc.subtract, "product": pc.multiply,
        "div": pc.divide, "max": pc.max_element_wise, "min": pc.min_element_wise,
    }.items():
        register("scalar_fn", name, fn)

    from . import valuesources as vs

    register("scalar_fn", "strdist", vs.levenshtein_to)
    register("scalar_fn", "ms", vs.ms_between)
    register("scalar_fn", "geodist", vs.geodist_km)


_register_builtins()
