"""CLI surface test: the reference README workflow (test → classified +
detected files → eval vs gold) through `python -m igtdetect_spark.cli`,
with the extracted pretrained model — detected bytes match the oracle."""

import os
import subprocess
import sys

import pytest

from igtdetect_spark.config import REF_MODEL_PATH, REF_SAMPLE_TEST
from igtdetect_spark.flagship import get_lexicons
from igtdetect_spark.oracle.freki import read_freki
from igtdetect_spark.oracle.pipeline import (
    detect_spans,
    detected_text,
    extract_doc_features,
    score_doc,
)
from igtdetect_spark.refmodel import load_reference_model


@pytest.mark.slow
def test_cli_train_auto_routes_to_distributed(tmp_path):
    """Above --collect-threshold the CLI trains via Spark ML instead of
    collecting features to the driver; the resulting model loads and
    selects the same chi² vocabulary as the collected path."""
    from igtdetect_spark.config import REF_SAMPLE_TRAIN

    dist_path = tmp_path / "dist.npz"
    coll_path = tmp_path / "coll.npz"
    # max-features above the total feature count: the chi² cutoff would
    # otherwise tie-break boundary features differently between the numpy
    # and Spark rankings (equal scores, different sort carriers)
    common = [
        sys.executable, "-m", "igtdetect_spark.cli",
        "--master", "local[4]", "--shuffle-partitions", "8",
        "train", "--files", REF_SAMPLE_TRAIN, "--max-features", "1000000",
    ]
    r1 = subprocess.run(
        common + ["--classifier-path", str(dist_path),
                  "--collect-threshold", "1"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "distributed Spark ML trainer" in r1.stderr
    r2 = subprocess.run(
        common + ["--classifier-path", str(coll_path)],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "distributed Spark ML trainer" not in r2.stderr

    from igtdetect_spark.refmodel import load_model

    dist, coll = load_model(str(dist_path)), load_model(str(coll_path))
    assert dist.classes == coll.classes
    # chi² feature selection is deterministic → identical vocabularies
    assert sorted(dist.feature_names) == sorted(coll.feature_names)


@pytest.mark.slow
def test_cli_test_eval_workflow(tmp_path):
    classified = tmp_path / "classified"
    detected = tmp_path / "detected"
    gold = tmp_path / "gold"
    gold.mkdir()
    # gold pairing is filename-based: <doc>_classified.freki ↔ <doc>.freki
    (gold / "2629.freki").write_text(
        open(REF_SAMPLE_TEST, encoding="utf-8").read(), encoding="utf-8"
    )

    r = subprocess.run(
        [
            sys.executable, "-m", "igtdetect_spark.cli",
            "--master", "local[4]", "--shuffle-partitions", "8",
            "--feat-dir", str(tmp_path / "feats"),
            "testeval",
            "--files", REF_SAMPLE_TEST,
            "--classifier-path", REF_MODEL_PATH,
            "--classified-dir", str(classified),
            "--detected-dir", str(detected),
            "--gold-dir", str(gold),
            "--out", str(tmp_path / "report.txt"),
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    # feature cache file: reference naming + gzip + one svmlight line per
    # input line
    import gzip

    fpath = tmp_path / "feats" / "2629_feats.txt.gz"
    assert fpath.exists()
    with gzip.open(fpath, "rt", encoding="utf-8") as f:
        feat_lines = f.read().splitlines()
    assert len(feat_lines) == 268
    assert all("\t" in l and ":1" in l for l in feat_lines if l)

    # classified file exists and re-parses with predicted tags
    cpath = classified / "2629_classified.freki"
    assert cpath.exists()
    from igtdetect_spark.oracle.freki import parse_freki

    cdoc = parse_freki(cpath.read_text(encoding="utf-8"))
    assert len(cdoc) == 268

    # detected bytes match the oracle exactly
    doc = read_freki(REF_SAMPLE_TEST)
    inst = extract_doc_features(doc, get_lexicons())
    labels, _ = score_doc(inst, load_reference_model(REF_MODEL_PATH))
    want = detected_text(detect_spans(doc, labels))
    dpath = detected / "2629_detected.txt"
    assert dpath.exists()
    assert dpath.read_text(encoding="utf-8") == want

    # eval report produced with the reference's section structure
    report = (tmp_path / "report.txt").read_text()
    assert "----- Labels -----" in report and "----- Spans ------" in report
