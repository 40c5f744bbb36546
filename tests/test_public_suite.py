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


def test_ok_vqa_stemming():
    from otter_tpu.benchmarks.public_suite.ok_vqa_utils import (
        OKVQAStemmer, postprocess_ok_vqa_generation)
    st = OKVQAStemmer()
    # manual-table entries (official OKVQA v1.1 constants)
    assert st.stem("christmas") == "christmas"
    assert st.stem("riding") == "ride"
    assert st.stem("leaves") == "leaf"
    # rules: -ing lemmatization + plural singularization
    assert st.stem("running") == "run"
    assert st.stem("dogs") == "dog"
    # postprocess truncates at the next turn before stemming
    assert postprocess_ok_vqa_generation(
        "two dogs Question: what else") == "two dog"


def test_eval_vqa_ok_vqa_applies_stemming():
    model = ScriptedEvalModel(answer="riding horses")
    items = [{"image": None, "question": "q?",
              "answers": ["ride horse"] * 10}]
    plain = evaluate_vqa(model, test_items=items, dataset_name="vqav2")
    stemmed = evaluate_vqa(model, test_items=items, dataset_name="ok_vqa")
    assert plain == 0.0
    assert stemmed == 100.0


class BatchScriptedModel(ScriptedEvalModel):
    """Counts batch calls to prove the batched path is used."""

    max_batch_size = 4

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.batch_calls = []

    def generate_batch(self, prompts, images):
        self.batch_calls.append(len(prompts))
        return [self.generate(p, im) for p, im in zip(prompts, images)]


def test_eval_vqa_batched_matches_itemwise():
    items = [{"image": None, "question": f"q{i}?", "answers": ["red"] * 10}
             for i in range(6)]
    item_model = ScriptedEvalModel()
    batch_model = BatchScriptedModel()
    a = evaluate_vqa(item_model, test_items=items)
    b = evaluate_vqa(batch_model, test_items=items)
    assert a == b == 100.0
    assert batch_model.batch_calls == [4, 2]  # chunked by max_batch_size


def test_two_process_eval_identical_global_score(tmp_path):
    """A 2-process distributed eval produces ONE identical global score on
    every process, equal to the single-process score (the reference gathers
    across DDP before scoring)."""
    import json
    import socket
    import subprocess
    import sys

    items = [{"image": None, "question": f"q{i}?",
              "answers": (["red"] * 10 if i % 3 else ["blue"] * 10)}
             for i in range(7)]
    manifest = tmp_path / "items.json"
    manifest.write_text(json.dumps(items))

    # single-process reference score
    expected = evaluate_vqa(ScriptedEvalModel(), test_items=items)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = f"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:{port}",
                           num_processes=2, process_id=int(sys.argv[1]))
sys.path.insert(0, {str(tmp_path)!r})
from otter_tpu.benchmarks.public_suite.evaluate import evaluate_vqa

class M:
    def generate(self, prompt, image=None):
        return "red"

items = json.load(open({str(manifest)!r}))
score = evaluate_vqa(M(), test_items=items, rank=jax.process_index(),
                     world=jax.process_count())
print("SCORE", jax.process_index(), score)
"""
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, str(i)],
        cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": ""}) for i in range(2)]
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
    scores = {}
    for out, _ in outs:
        for line in out.splitlines():
            if line.startswith("SCORE"):
                _, rank, sc = line.split()
                scores[int(rank)] = float(sc)
    assert set(scores) == {0, 1}
    assert scores[0] == scores[1] == pytest.approx(expected)
