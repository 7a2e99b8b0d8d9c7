"""Eval metrics + dreamer success rules."""

import numpy as np

from simlingo_tpu.eval import dreamer_rules as D
from simlingo_tpu.eval import metrics as M


def test_exact_and_bleu_perfect():
    preds = ["the car stops", "turn left now"]
    out = M.evaluation_suite(preds, preds)
    assert out["accuracy"] == 1.0
    assert abs(out["bleu_1"] - 1.0) < 1e-9
    assert abs(out["rouge_l"] - 1.0) < 1e-9
    assert out["cider"] > 5.0


def test_metrics_degrade_with_mismatch():
    refs = ["the red car stops at the light", "the ego turns left"]
    good = ["the red car stops at the light", "the ego turns left now"]
    bad = ["banana banana banana", "completely unrelated words here"]
    mg = M.evaluation_suite(good, refs)
    mb = M.evaluation_suite(bad, refs)
    assert mg["bleu_4"] > mb["bleu_4"]
    assert mg["rouge_l"] > mb["rouge_l"]
    assert mg["cider"] > mb["cider"]
    assert mg["meteor"] > mb["meteor"]


def test_meteor():
    # identical sentences: F_mean = 1, one chunk over m matches
    refs = ["the ego vehicle brakes hard for the pedestrian"]
    s_perfect = M.meteor(refs, refs)
    m = 8
    assert abs(s_perfect - (1 - 0.5 * (1 / m) ** 3)) < 1e-9
    # stem stage matches inflected forms (braking ~ brakes)
    s_stem = M.meteor(["the ego vehicle braking hard"], refs)
    s_nostem = M.meteor(["the ego vehicle xyzzy hard"], refs)
    assert s_stem > s_nostem > 0.0
    # scrambled word order is penalized via fragmentation
    s_scrambled = M.meteor(
        ["pedestrian the for hard brakes vehicle ego the"], refs)
    assert s_perfect > s_scrambled > 0.0
    assert M.meteor(["anything"], [""]) == 0.0


def test_meteor_synonym_stage():
    """The optional synonymy stage (reference METEOR's WordNet stage,
    eval_metrics.py via pycocoevalcap) aligns words no exact/stem stage
    can; injectable provider keeps the test corpus-independent."""
    refs = ["the car stops for the person"]
    hyp = ["the automobile halts for the person"]
    table = {"automobile": {"car", "auto"}, "halts": {"stop", "stops"}}
    syn = lambda w: table.get(w, set())  # noqa: E731
    s_with = M.meteor(hyp, refs, synonyms=syn)
    s_without = M.meteor(hyp, refs, synonyms=None)
    assert s_with > s_without
    # default provider degrades gracefully when no corpus is installed
    assert M.wordnet_synonyms("car") == set() or True
    assert M.meteor(hyp, refs) >= s_without


def _wps(speed, n=10, decel=0.0):
    """Waypoints of a vehicle at `speed` m/s with optional decel m/s^2."""
    t = np.arange(1, n + 1) * 0.25
    v = np.maximum(speed + decel * t, 0.0)
    x = np.cumsum(v * 0.25)
    return np.stack([x, np.zeros(n)], 1)


def test_dreamer_rules():
    org_wps = _wps(5.0)
    org_route = np.stack([np.arange(1, 21), np.zeros(20)], 1)
    new_route = np.stack([np.arange(1, 21), np.full(20, 3.5)], 1)  # lane change

    # stop
    assert D.evaluate_sample("stop", _wps(0.0), org_route, org_wps, org_route,
                             org_wps, org_route, 5.0) is True
    assert D.evaluate_sample("stop", _wps(5.0), org_route, org_wps, org_route,
                             org_wps, org_route, 5.0) is False
    # slower / faster
    assert D.evaluate_sample("slower", _wps(5.0, decel=-1.5), org_route,
                             org_wps, org_route, org_wps, org_route, 5.0)
    assert not D.evaluate_sample("slower", _wps(5.0), org_route, org_wps,
                                 org_route, org_wps, org_route, 5.0)
    assert D.evaluate_sample("faster", _wps(5.0, decel=1.5), org_route,
                             org_wps, org_route, org_wps, org_route, 5.0)
    # lane change: predicted route near the instructed lane
    pred_route = np.stack([np.arange(1, 21), np.full(20, 3.0)], 1)
    assert D.evaluate_sample("lane_change", org_wps, pred_route, org_wps,
                             org_route, org_wps, new_route, 5.0)
    assert not D.evaluate_sample("lane_change", org_wps, org_route, org_wps,
                                 org_route, org_wps, new_route, 5.0)
    # target speed
    tgt = _wps(8.0)
    assert D.evaluate_sample("target_speed", _wps(8.0), org_route, org_wps,
                             org_route, tgt, org_route, 5.0)
    assert not D.evaluate_sample("target_speed", _wps(2.0), org_route,
                                 org_wps, org_route, tgt, org_route, 5.0)

    agg = D.aggregate([
        {"mode": "stop", "success": True, "allowed": True},
        {"mode": "stop", "success": False, "allowed": True},
        {"mode": "faster", "success": True, "allowed": True},
    ])
    assert abs(agg["success_rate_total"] - 2 / 3) < 1e-9
    assert agg["success_rate_stop"] == 0.5


def test_spice_scene_tuples_and_f1():
    from simlingo_tpu.eval.metrics import scene_tuples, spice

    t = scene_tuples("The ego vehicle stays behind the red vehicle and "
                     "stops because of the red traffic light.")
    assert ("red", "vehicle") in t
    assert ("red", "traffic light") in t
    assert ("ego vehicle",) in t
    assert ("rel", "stops") in t

    # same scene content, different phrasing -> high F1 (relation-object
    # pairing is word-order sensitive, so not exactly 1.0)
    a = "The ego vehicle slows down to stay behind the red vehicle."
    b = "To stay behind the red vehicle, the ego vehicle slows down."
    assert spice([a], [b]) > 0.8
    # unrelated content -> low F1
    lo = spice(["The pedestrian crosses the road."],
               ["The ego vehicle accelerates to the speed limit."])
    assert lo < 0.5
    # partial overlap is between the two
    mid = spice(["The ego vehicle stops for the red traffic light."],
                ["The ego vehicle stops for the stop sign."])
    assert 0.2 < mid < 1.0


def test_gpt_judge_threaded(monkeypatch):
    """gpt_judge fans requests over a thread pool (reference
    eval_metrics.py:110 uses Pool(16)); failing/non-numeric responses are
    dropped from the mean."""
    import sys
    import threading
    import types

    calls = {"n": 0, "threads": set()}
    lock = threading.Lock()

    class _Msg:
        def __init__(self, content):
            self.content = content

    class _Choice:
        def __init__(self, content):
            self.message = _Msg(content)

    class _Resp:
        def __init__(self, content):
            self.choices = [_Choice(content)]

    class _Completions:
        def create(self, model, messages):
            with lock:
                calls["n"] += 1
                calls["threads"].add(threading.get_ident())
                i = calls["n"]
            if i == 3:
                raise RuntimeError("transient API error")
            if i == 4:
                return _Resp("not a number")
            return _Resp("80")

    class _Chat:
        completions = _Completions()

    class _Client:
        def __init__(self, api_key=None, base_url=None):
            self.chat = _Chat()

    fake = types.ModuleType("openai")
    fake.OpenAI = _Client
    monkeypatch.setitem(sys.modules, "openai", fake)
    monkeypatch.setenv("OPENAI_API_KEY", "test-key")

    preds = [f"pred {i}" for i in range(6)]
    refs = [f"ref {i}" for i in range(6)]
    score = M.gpt_judge(preds, refs)
    assert calls["n"] == 6
    # 2 of 6 dropped (error + non-numeric); remaining 4 all scored 80
    assert score == 80.0

    monkeypatch.delenv("OPENAI_API_KEY")
    assert M.gpt_judge(preds, refs) is None
