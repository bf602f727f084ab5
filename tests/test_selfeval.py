"""Quality-parity regression (BASELINE.md): self-evaluation of the
extracted pretrained model on the reference sample freki docs — pinned
metrics; any feature/scoring semantics drift shows up here."""

import pytest

from igtdetect_spark.config import REF_MODEL_PATH, REF_SAMPLE_TEST, REF_SAMPLE_TRAIN
from igtdetect_spark.flagship import get_lexicons
from igtdetect_spark.refmodel import load_reference_model


def test_selfeval_sample_docs_pinned(spark):
    from igtdetect_spark.operators.segment import segment_freki_files
    from igtdetect_spark.plans.pipeline import DetectContext
    from igtdetect_spark.plans.selfeval import selfeval_lines

    ctx = DetectContext(
        spark, load_reference_model(REF_MODEL_PATH), get_lexicons()
    )
    lines = segment_freki_files(spark, [REF_SAMPLE_TEST, REF_SAMPLE_TRAIN])
    res = selfeval_lines(lines, ctx)

    # pinned from the verified oracle-parity build (2026-08-16)
    assert res.labels.accuracy == pytest.approx(0.890417, abs=1e-5)
    assert res.labels.non_o_precision == pytest.approx(0.900000, abs=1e-5)
    assert res.labels.non_o_recall == pytest.approx(0.019149, abs=1e-5)
    assert res.spans.n_system == 8
    assert res.spans.n_gold == 151
    assert res.spans.partial_p == pytest.approx(0.8750, abs=1e-4)
    assert "Classifiation Acc: 0.89" in res.report  # reference's own typo
    # auto-span section (gold spans = contiguous non-O gold runs)
    assert res.auto_spans is not None
    assert res.auto_spans.n_system == 8
    # adjacent distinct span_ids merge into one contiguous run → fewer
    # auto gold spans than span_id gold spans (151 → 88 on the samples)
    assert res.auto_spans.n_gold == 88
    assert "--- Auto-Spans ---" in res.report
