"""Language-ID quality gate on the pages corpus.

The fixture injects ENGLISH function words into every Latin-language doc
(by design — the analysis chain is language-routed, not the vocabulary), so
only SCRIPT-level detection is ground-truth-verifiable: CJK-labelled docs
must classify as zh/ja, Latin-labelled docs must never classify as CJK."""

from __future__ import annotations

import pyarrow as pa


def test_cjk_script_detection(ray_session, oracle_rows):
    import ray.data as rd

    from lucene_solr_ray.stages.textstats import LanguageId

    tbl = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in oracle_rows], type=pa.int64()),
            "lang": pa.array([r["lang"] for r in oracle_rows]),
            "text": pa.array([r["text"] for r in oracle_rows]),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(LanguageId, batch_format="pyarrow", concurrency=2)
        .select_columns(["lang", "lang_pred"])
        .to_pandas()
    )
    cjk_true = out[out["lang"].isin(["zh", "ja"])]
    latin_true = out[~out["lang"].isin(["zh", "ja"])]
    assert len(cjk_true) > 5 and len(latin_true) > 5
    # CJK docs overwhelmingly classify to a CJK language
    cjk_acc = cjk_true["lang_pred"].isin(["zh", "ja"]).mean()
    assert cjk_acc >= 0.8, cjk_acc
    # Latin docs never classify as CJK
    assert (~latin_true["lang_pred"].isin(["zh", "ja"])).all()
    # and mostly as a Latin-profile language or 'und'
    assert latin_true["lang_pred"].isin(["en", "de", "fr", "es", "da", "und"]).all()
