"""Rank-classification utilities (reference
`public_datasets_suite/classification_utils.py`): the model scores each
candidate class name appended to the prompt via `eval_forward`
(log-likelihood), prediction = argmax. HatefulMemes classes embedded;
ImageNet's 1000 class names load from a user-supplied file (one per line)
to avoid vendoring the list."""

from __future__ import annotations

from typing import List, Sequence

HM_CLASSNAMES = ["no", "yes"]  # hateful-memes: is the meme hateful?
HM_CLASS_ID_TO_LABEL = {0: "no", 1: "yes"}


def load_classnames(path: str) -> List[str]:
    with open(path) as f:
        return [l.strip() for l in f if l.strip()]


def rank_classification(model, question: str, image,
                        classnames: Sequence[str]) -> int:
    """Returns the index of the highest-likelihood class."""
    scores = [model.eval_forward(question, c, image) for c in classnames]
    return max(range(len(classnames)), key=lambda i: scores[i])
