"""Live parity of all 14 benchmark loaders vs the reference data_loader.py.

Builds each benchmark's annotation tree (json/jsonl/csv+txt/parquet and
dummy video files) under a temp cwd, then runs BOTH the reference's
loader (eval/vllm_inference/data/data_loader.py, imported standalone)
and ours (timeviper_tpu/eval/loaders.py) on the same tree and asserts
record-identical output. The loaders normalize 14 different annotation
schemas; a single divergent field (qid format, option lettering, answer
index, video path) silently breaks score comparability downstream.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

REF_LOADER = "/root/reference/eval/vllm_inference/data/data_loader.py"


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_data_loader", REF_LOADER)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference data_loader unimportable: {e}")
    return mod


@pytest.fixture()
def tree(tmp_path, monkeypatch):
    """chdir into a scratch dir — both sides resolve ./dataset/… there."""
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _mkvideo(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"\x00")


def _wjson(path, obj):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)


def _wjsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _assert_same(ours, theirs, key=None):
    if key:
        ours = sorted(ours, key=key)
        theirs = sorted(theirs, key=key)
    assert len(ours) == len(theirs)
    for a, b in zip(ours, theirs):
        assert a == b, (a, b)


# --------------------------------------------------------------------- tg


def test_activitynet(ref, tree):
    from timeviper_tpu.eval.loaders import load_benchmark

    _wjson("dataset/activitynet/annotations/sentence_temporal_grounding/"
           "val.json",
           {"v_a": {"duration": 120.5, "timestamps": [[0, 10], [20, 42.5]],
                    "sentences": ["A man runs. ", "He stops."]},
            "v_b": {"duration": 60.0, "timestamps": [[5, 25]],
                    "sentences": ["A dog barks."]}})
    _mkvideo("dataset/activitynet/videos/v_a.mp4")
    _mkvideo("dataset/activitynet/videos/v_b.mkv")  # exercises ext probing
    _assert_same(load_benchmark("activitynet"), ref.load_activitynet())


def test_charades_builds_json_from_txt_csv(ref, tree):
    from timeviper_tpu.eval.loaders import load_charades

    os.makedirs("dataset/charades/Charades_anno", exist_ok=True)
    with open("dataset/charades/Charades_anno/Charades_sta_test.txt", "w") as f:
        f.write("VID01 0.0 11.2##a person opens a door\n")
        f.write("VID01 12.0 30.0##they walk through it\n")
        f.write("\n")
        f.write("VID02 3.5 9.0##someone pours coffee\n")
    with open("dataset/charades/Charades_anno/Charades_v1_test.csv", "w") as f:
        f.write("id,length\nVID01,31.2\nVID02,14.0\n")
    ours = load_charades(split="test")
    # our run cached the built json; delete it so the reference exercises
    # its own txt+csv build path too
    os.remove("dataset/charades/Charades_anno/Charades_sta_test.json")
    _assert_same(ours, ref.load_charades())


def test_tvgbench(ref, tree):
    from timeviper_tpu.eval.loaders import load_benchmark

    _mkvideo("vids/x.mp4")
    _mkvideo("vids/y.mp4")
    _wjson("dataset/trainval/tvgbench.json", [
        {"path": "vids/x.mp4", "duration": "33.0", "answer": "1.5-9",
         "question": "find the jump", "start": 0.0, "end": 33.0,
         "source": "anno/charades-sta.v1.json"},
        {"path": "vids/missing.mp4", "duration": "10", "answer": "0-1",
         "question": "skipped", "start": 0, "end": 10,
         "source": "anno/x.json"},
        {"path": "vids/y.mp4", "duration": "50", "answer": "10-20.5",
         "question": "find the spin", "start": 5.0, "end": 45.0,
         "source": "anno/tacos.2-1.json"},
    ])
    _assert_same(load_benchmark("tvgbench"), ref.load_tvgbench())


def test_tvgbench_filter(ref, tree):
    from timeviper_tpu.eval.loaders import load_benchmark

    path = str(tree / "filtered.json")
    _wjson(path, [
        {"video": "a.mp4", "duration": 30.0, "timestamp": [1, 2],
         "sentence": "s1", "qid": "q_0", "pred": [1.0, 2.5],
         "video_start": 0.0, "video_end": 30.0},
    ])
    _assert_same(load_benchmark("tvgbench_filter", split=path),
                 ref.load_tvgbench_filter(path))


# -------------------------------------------------------------------- mcq


def test_mlvu(ref, tree):
    from timeviper_tpu.eval.loaders import load_benchmark

    _wjson("dataset/mlvu/MLVU/json/1_plotQA.json", [
        {"video": "p1.mp4", "question_type": "plotQA", "duration": 420,
         "question": "who?", "candidates": ["alice", "bob", "carol"],
         "answer": "bob"},
        {"video": "p2.mp4", "question_type": "summary", "duration": 100,
         "question": "summarize", "answer": "free text, no candidates"},
    ])
    _wjson("dataset/mlvu/MLVU/json/4_count.json", [
        {"video": "c1.mp4", "question_type": "count", "duration": 60,
         "question": "how many?", "candidates": ["1", "2"], "answer": "2"},
    ])
    _assert_same(load_benchmark("mlvu"), ref.load_mlvu(),
                 key=lambda r: r["qid"])


def test_longvideobench(ref, tree):
    from timeviper_tpu.eval.loaders import load_benchmark

    _wjson("dataset/longvideobench/lvb_val.json", [
        {"video_path": "vid1.mp4", "question": "q1",
         "candidates": ["u", "v", "w", "x"], "correct_choice": 2,
         "duration_group": 600, "question_category": "E2O", "id": "val_1"},
    ])
    _wjson("dataset/longvideobench/lvb_test_wo_gt.json", [
        {"video_path": "vid2.mp4", "question": "q2",
         "candidates": ["a", "b"], "duration_group": 3600,
         "question_category": "S2A", "id": "test_9"},
    ])
    _assert_same(load_benchmark("longvideobench", split="val"),
                 ref.load_longvideobench(split="val"))
    _assert_same(load_benchmark("longvideobench", split="test"),
                 ref.load_longvideobench(split="test"))


def test_lvbench(ref, tree):
    from timeviper_tpu.eval.loaders import load_benchmark

    _wjsonl("dataset/lvbench/data/video_info.meta.jsonl", [
        {"key": "yt_abc", "qa": [
            {"question": "what color?\n(A) red\n(B) blue",
             "answer": "B", "question_type": "perception", "uid": 7},
            {"question": "when?\n(A) day\n(B) night\n(C) dusk",
             "answer": "A", "question_type": "temporal", "uid": 8},
        ]},
    ])
    _assert_same(load_benchmark("lvbench"), ref.load_lvbench())


def test_videomme(ref, tree):
    import pandas as pd

    from timeviper_tpu.eval.loaders import load_benchmark

    os.makedirs("dataset/videomme/videomme", exist_ok=True)
    pd.DataFrame({
        "videoID": ["v1", "v2", "v3"],
        "question": ["q1", "q2", "q3"],
        "options": [["A. x", "B. y"], ["A. 1", "B. 2"], ["A. p", "B. q"]],
        "answer": ["A", "B", "A"],
        "duration": ["short", "long", "medium"],
        "task_type": ["ocr", "count", "ocr"],
        "question_id": ["001-1", "002-1", "003-2"],
    }).to_parquet("dataset/videomme/videomme/test.parquet")
    _assert_same(load_benchmark("videomme"), ref.load_videomme())
    _assert_same(load_benchmark("videomme", split="long"),
                 ref.load_videomme(split="long"))


def test_egoschema(ref, tree):
    import pandas as pd

    from timeviper_tpu.eval.loaders import load_benchmark

    os.makedirs("dataset/egoschema/MC", exist_ok=True)
    pd.DataFrame({
        "video_idx": ["0a1b", "2c3d"],
        "question": ["what happens?", "why?"],
        "option": [["0. first opt", "1. second opt"],
                   ["0. yes", "1. no", "2. maybe"]],
        "answer": [1, 0],
        "question_idx": ["q0", "q1"],
    }).to_parquet("dataset/egoschema/MC/test.parquet")
    _assert_same(load_benchmark("egoschema"), ref.load_egoschema())


def test_tempcompass(ref, tree):
    from timeviper_tpu.eval.loaders import load_benchmark

    _wjson("dataset/tempcompass/questions/multi-choice.json", {
        "vidA": {"direction": [
            {"question": "which way?\nA. left\nB. right", "answer": "B. right"},
        ]},
    })
    _wjson("dataset/tempcompass/questions/yes_no.json", {
        "vidA": {"speed": [{"question": "is it fast?", "answer": "no"}]},
    })
    _wjson("dataset/tempcompass/questions/caption_matching.json", {
        "vidB": {"order": [
            {"question": "pick:\nCaption A: a man walks\nCaption B: a man "
                         "runs", "answer": "Caption B: a man runs"},
        ]},
    })
    for split in ("multi-choice", "yes_no", "caption_matching"):
        _assert_same(load_benchmark("tempcompass", split=split),
                     ref.load_tempcompass(split=split))


def test_mvbench(ref, tree):
    from timeviper_tpu.eval.loaders import load_benchmark

    _wjson("dataset/mvbench/json/action_count.json", [
        {"video": "p1.mp4", "question": "how many jumps?",
         "candidates": ["3", "4"], "answer": "4"},
    ])
    _wjson("dataset/mvbench/json/action_localization.json", [
        # start+end present -> pre-split clip path
        {"video": "s1.mp4", "question": "when?", "candidates": ["a", "b"],
         "answer": "a", "start": 1.5, "end": 7.0},
        # only start -> rides as video_start
        {"video": "s2.mp4", "question": "then?", "candidates": ["c", "d"],
         "answer": "d", "start": 3.0},
    ])
    _assert_same(load_benchmark("mvbench"), ref.load_mvbench(),
                 key=lambda r: r["qid"])


def test_cgbench(ref, tree):
    from timeviper_tpu.eval.loaders import load_benchmark

    _wjson("dataset/cgbench/cgbench.json", [
        {"video_uid": "u1", "question": "what?", "choices": ["x", "y", "z"],
         "right_answer": "C", "duration": 1800.0,
         "sub_category": "event", "qid": "31"},
    ])
    _assert_same(load_benchmark("cgbench"), ref.load_cgbench())


# ---------------------------------------------------------------- caption


def test_auroracap(ref, tree):
    from timeviper_tpu.eval.loaders import load_benchmark

    _wjsonl("dataset/auroracap/VDC_1k.jsonl", [
        {"video_name": "clip1.mp4", "video_id": "c1",
         "background_caption": "bg", "camera_caption": "cam",
         "detailed_caption": "det", "main_object_caption": "obj",
         "short_caption": "sh"},
    ])
    _assert_same(load_benchmark("auroracap"), ref.load_auroracap())
    _assert_same(load_benchmark("auroracap", split="short"),
                 ref.load_auroracap(split="short"))


def test_youcook2(ref, tree):
    from timeviper_tpu.eval.loaders import load_benchmark

    _wjson("dataset/youcook2/annotations/"
           "youcookii_annotations_trainval.json", {"database": {
               "y1": {"subset": "validation", "recipe_type": "101",
                      "duration": 241.6, "annotations": [
                          {"segment": [0, 30], "sentence": "chop", "id": 0},
                          {"segment": [35, 80], "sentence": "fry", "id": 1}]},
               "y2": {"subset": "training", "recipe_type": "102",
                      "duration": 100.0, "annotations": []},
           }})
    _mkvideo("dataset/youcook2/raw_videos/validation/101/y1.webm")
    _assert_same(load_benchmark("youcook2"), ref.load_youcook2())
