"""Public-datasets suite tests: VQA accuracy normalization, CIDEr scorer
sanity, few-shot drivers with a scripted model, rank classification."""

import pytest

from otter_tpu.benchmarks.public_suite.coco_metric import (
    CiderScorer, compute_cider, postprocess_captioning_generation)
from otter_tpu.benchmarks.public_suite.evaluate import (
    evaluate_captioning, evaluate_classification, evaluate_vqa)
from otter_tpu.benchmarks.public_suite.vqa_metric import (
    compute_vqa_accuracy, normalize_answer, vqa_accuracy)


def test_vqa_normalization():
    assert normalize_answer("Two dogs.") == "2 dogs"
    assert normalize_answer("a red ball") == "red ball"
    assert normalize_answer("isnt") == "isn't"


def test_vqa_accuracy():
    gts = ["red"] * 5 + ["blue"] * 5
    assert vqa_accuracy("red", gts) == 1.0
    assert vqa_accuracy("green", gts) == 0.0
    gts = ["red"] * 2 + ["blue"] * 8
    assert 0 < vqa_accuracy("red", gts) < 1.0
    assert compute_vqa_accuracy(
        [{"prediction": "red", "answers": ["red"] * 10}]) == 100.0


def test_cider_scorer():
    refs = {"1": ["a cat sits on the mat", "the cat is on a mat"],
            "2": ["a dog runs in the park", "the dog is running"]}
    good = {"1": "a cat sits on the mat", "2": "a dog runs in the park"}
    bad = {"1": "quantum flux capacitor", "2": "purple elephant tango"}
    s_good = CiderScorer().compute(good, refs)
    s_bad = CiderScorer().compute(bad, refs)
    assert s_good > s_bad
    assert s_bad < 0.5


class ScriptedEvalModel:
    def __init__(self, caption="a cat on the mat", answer="red"):
        self.caption = caption
        self.answer = answer

    def generate(self, prompt, image=None):
        if "Short answer:" in prompt:
            return self.answer
        return self.caption

    def eval_forward(self, question, answer, image=None):
        return 1.0 if answer == "yes" else 0.0


def test_eval_captioning_driver():
    test_items = [{"image": None, "caption": "a cat on the mat",
                   "image_id": "x"},
                  {"image": None, "caption": "a dog under a tree",
                   "image_id": "y"}]
    score = evaluate_captioning(ScriptedEvalModel(), test_items=test_items)
    assert score > 0.5  # one exact match out of two -> nonzero CIDEr


def test_eval_vqa_driver():
    test_items = [{"image": None, "question": "color?",
                   "answers": ["red"] * 10}]
    train_items = [{"image": None, "question": "shape?",
                    "answers": ["round"]}] * 5
    acc = evaluate_vqa(ScriptedEvalModel(), test_items=test_items,
                       train_items=train_items, num_shots=4)
    assert acc == 100.0


def test_eval_classification_driver():
    items = [{"image": None, "class_id": 1},
             {"image": None, "class_id": 0}]
    acc = evaluate_classification(ScriptedEvalModel(), test_items=items,
                                  classnames=["no", "yes"])
    assert acc == 50.0


def test_postprocess():
    assert postprocess_captioning_generation(
        "a cat\nOutput: more") == "a cat"


def test_manifest_loaders(tmp_path):
    import json
    from otter_tpu.benchmarks.public_suite.manifests import (
        load_coco_captions, load_hateful_memes, load_karpathy_split,
        load_vqav2)

    coco = {"images": [{"id": 7, "file_name": "a.jpg"}],
            "annotations": [{"image_id": 7, "caption": "a cat"},
                            {"image_id": 7, "caption": "feline"}]}
    p = tmp_path / "coco.json"
    p.write_text(json.dumps(coco))
    items = load_coco_captions(str(p), "/imgs")
    assert items[0]["image_id"] == "7" and len(items[0]["captions"]) == 2

    karpathy = {"images": [
        {"split": "test", "filepath": "val2014", "filename": "b.jpg",
         "cocoid": 9, "imgid": 1,
         "sentences": [{"raw": "a dog"}, {"raw": "canine"}]},
        {"split": "train", "filename": "c.jpg", "imgid": 2,
         "sentences": [{"raw": "x"}]}]}
    p = tmp_path / "karpathy.json"
    p.write_text(json.dumps(karpathy))
    items = load_karpathy_split(str(p), "/r", split="test")
    assert len(items) == 1 and items[0]["image_id"] == "9"

    qs = {"questions": [{"question_id": 1, "image_id": 42,
                         "question": "what color?"}]}
    anns = {"annotations": [{"question_id": 1,
                             "answers": [{"answer": "red"}] * 10}]}
    qp, ap = tmp_path / "q.json", tmp_path / "a.json"
    qp.write_text(json.dumps(qs))
    ap.write_text(json.dumps(anns))
    items = load_vqav2(str(qp), str(ap), "/imgs")
    assert items[0]["answers"] == ["red"] * 10
    assert "000000000042" in items[0]["image"]

    hm = tmp_path / "dev.jsonl"
    hm.write_text('{"img": "img/1.png", "label": 1, "text": "t"}\n')
    items = load_hateful_memes(str(hm), "/r")
    assert items[0]["class_id"] == 1
