"""Hand-computed oracle tests for the trec_eval-compatible metrics."""

import json
import math

import numpy as np
import pytest

from scaling_retriever_tpu.evaluation import metrics


QREL = {
    "q1": {"d1": 2, "d2": 1, "d9": 0},   # two relevant (graded), one judged-0
    "q2": {"d5": 1},
    "q3": {"d7": 1, "d8": 1},
}
RUN = {
    "q1": {"d3": 5.0, "d1": 4.0, "d2": 1.0, "d4": 0.5},
    "q2": {"d6": 3.0, "d4": 2.0, "d5": 1.0},
    "q3": {"d8": 9.0, "d7": 8.0},
}


def test_recip_rank_and_mrr():
    per_q = metrics.evaluate_per_query(RUN, QREL, "recip_rank")
    assert per_q["q1"]["recip_rank"] == pytest.approx(1 / 2)
    assert per_q["q2"]["recip_rank"] == pytest.approx(1 / 3)
    assert per_q["q3"]["recip_rank"] == pytest.approx(1.0)
    # MRR@2 truncation drops q2's hit at rank 3
    mrr2 = metrics.mrr_k(RUN, QREL, k=2)
    assert mrr2 == pytest.approx((1 / 2 + 0 + 1) / 3)


def test_recall():
    per_q = metrics.evaluate_per_query(RUN, QREL, "recall")
    assert per_q["q1"]["recall_5"] == pytest.approx(2 / 2)
    assert per_q["q1"]["recall_10"] == pytest.approx(1.0)
    assert per_q["q2"]["recall_5"] == pytest.approx(1.0)
    agg = metrics.evaluate(RUN, QREL, "recall")
    assert agg["recall_5"] == pytest.approx(1.0)
    # recall at cut 2: q1 gets only d1 (1/2), q2 gets 0, q3 gets 2/2
    assert metrics.recall_at(["d3", "d1"], QREL["q1"], 2) == pytest.approx(0.5)
    # agg=False returns per-query dicts (reference metrics.py:31-42)
    per_q5 = metrics.recall_k(RUN, QREL, 5, agg=False)
    assert per_q5["q1"]["recall_5"] == pytest.approx(1.0)
    assert metrics.recall_k(RUN, QREL, 5) == pytest.approx(
        sum(d["recall_5"] for d in per_q5.values()) / 3)


def test_ndcg_cut_linear_gain():
    # q1 ranked: d3(0), d1(2), d2(1), d4(0)
    dcg = 2 / math.log2(3) + 1 / math.log2(4)
    idcg = 2 / math.log2(2) + 1 / math.log2(3)
    per_q = metrics.evaluate_per_query(RUN, QREL, "ndcg_cut")
    assert per_q["q1"]["ndcg_cut_10"] == pytest.approx(dcg / idcg)
    assert per_q["q3"]["ndcg_cut_10"] == pytest.approx(1.0)


def test_map_and_precision():
    per_q = metrics.evaluate_per_query(RUN, QREL, "map_cut")
    # q1: hits at ranks 2,3 -> AP = (1/2 + 2/3)/2
    assert per_q["q1"]["map_cut_10"] == pytest.approx((1 / 2 + 2 / 3) / 2)
    p = metrics.evaluate_per_query(RUN, QREL, "P")
    assert p["q1"]["P_5"] == pytest.approx(2 / 5)


def test_r_cap():
    # q1 has 2 rels; top-1 contains 0 rel -> r_cap_1 = 0; top-2 has d1 -> 1/min(2,2)
    ranked = ["d3", "d1", "d2"]
    assert metrics.r_cap_at(ranked, QREL["q1"], 1) == 0
    assert metrics.r_cap_at(ranked, QREL["q1"], 2) == pytest.approx(1 / 2)


def test_tie_break_is_docid_desc():
    run = {"q1": {"dA": 1.0, "dB": 1.0}}
    qrel = {"q1": {"dB": 1}}
    # tie broken by doc id desc -> dB first -> rr = 1
    per_q = metrics.evaluate_per_query(run, qrel, "recip_rank")
    assert per_q["q1"]["recip_rank"] == 1.0


def test_beir_protocol_removes_self_match(tmp_path):
    run = {"q1": {"q1": 100.0, "d1": 5.0, "d2": 1.0}}
    qrels = {"q1": {"d1": 1}}
    (tmp_path / "run.json").write_text(json.dumps(run))
    res = metrics.evaluate_beir(str(tmp_path), qrels)
    assert res["NDCG@10"] == pytest.approx(1.0)  # self-match q1 removed
    assert (tmp_path / "perf.json").exists()


def test_load_and_evaluate_trec_discipline(tmp_path):
    qrel_path = tmp_path / "TREC_DL_2019" / "qrel.json"
    qrel_path.parent.mkdir()
    qrel_path.write_text(json.dumps(QREL))
    run_path = tmp_path / "run.json"
    run_path.write_text(json.dumps(RUN))
    res = metrics.load_and_evaluate(str(qrel_path), str(run_path), "ndcg_cut")
    assert "ndcg_cut_10" in res
    with pytest.raises(AssertionError):
        metrics.load_and_evaluate(str(qrel_path), str(run_path), "mrr_10")

    binary_path = tmp_path / "TREC_DL_2019" / "qrel_binary.json"
    binary_path.write_text(json.dumps({q: {d: int(r > 0) for d, r in ds.items()}
                                       for q, ds in QREL.items()}))
    res = metrics.load_and_evaluate(str(binary_path), str(run_path), "mrr_10")
    assert res["mrr_10"] == pytest.approx((1 / 2 + 1 / 3 + 1) / 3)


def test_squad_em_f1():
    assert metrics.exact_match_score("The Cat!", "cat")
    assert metrics.ems("dog", ["cat", "a Dog"])
    assert metrics.f1("the black cat", "black cat") == pytest.approx(1.0)
    got = metrics.f1("black dog", "black cat")
    assert got == pytest.approx(0.5)
    assert metrics.f1_with_gts("black dog", ["black cat", "white dog"]) == \
        pytest.approx(0.5)
    assert metrics.f1("xyz", "abc") == 0.0
