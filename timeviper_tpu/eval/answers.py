"""Answer extraction from generated text, per datatype.

Matches the reference's regex semantics exactly so scores are comparable
(reference: evaluate.py:252-299, eval/vllm_inference/utils.py:68-83):

* tg — last "X to/and Y" match (falling back to an <answer>...</answer> span)
  parsed as [start, end] floats,
* mcq — first character (or the one after "("), mapped A->0,
* caption — DVC "start - end seconds, description" lines parsed into
  timestamps + captions.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

_TG_SPAN = re.compile(r"(\d+\.?\d*) (to|and) (\d+\.?\d*)")
_TG_ANSWER_TAG = re.compile(r"<answer>(.*?)</answer>")

# dataset name -> datatype (reference eval/vllm_inference/utils.py:68-83)
DATASET_TYPES: Dict[str, str] = {
    "activitynet": "tg",
    "charades": "tg",
    "tvgbench": "tg",
    "tvgbench_filter": "tg",
    "videomme": "mcq",
    "egoschema": "mcq",
    "mlvu": "mcq",
    "longvideobench": "mcq",
    "lvbench": "mcq",
    "tempcompass": "mcq",
    "mvbench": "mcq",
    "cgbench": "mcq",
    "auroracap": "caption",
    "youcook2": "caption",
}


def get_dataset_type(dataset_name: str) -> str:
    return DATASET_TYPES[dataset_name]


def extract_tg(text: str) -> List[Optional[float]]:
    matches = _TG_SPAN.findall(text)
    if not matches:
        tag = _TG_ANSWER_TAG.search(text)
        if tag:
            matches = _TG_SPAN.findall(tag.group(1).strip())
        if not matches:
            return [None, None]
    last = matches[-1]
    try:
        return [float(last[0]), float(last[2])]
    except ValueError:
        return [None, None]


def extract_mcq(text: str) -> Optional[int]:
    try:
        letter = text[1] if text[0] == "(" else text[0]
    except Exception:
        letter = "A"
    return ord(letter) - ord("A")


_DVC_LINE = re.compile(
    r"(\d+\.?\d*)\s*-\s*(\d+\.?\d*)\s*seconds?,\s*(.+?)(?=(?:\d+\.?\d*\s*-)|$)",
    re.DOTALL,
)


def extract_dvc(text: str) -> Dict[str, list]:
    """Parse "start - end seconds, caption" event lines (reference
    eval_dvc.py parse_dvc_prediction semantics)."""
    timestamps, captions = [], []
    for m in _DVC_LINE.finditer(text):
        try:
            s, e = float(m.group(1)), float(m.group(2))
        except ValueError:
            continue
        timestamps.append([s, e])
        captions.append(m.group(3).strip().rstrip("."))
    return {"timestamps": timestamps, "captions": captions}


def extract_answer(output_string: str, datatype: str):
    if datatype == "tg":
        return extract_tg(output_string)
    if datatype == "mcq":
        return extract_mcq(output_string)
    if datatype == "caption":
        return extract_dvc(output_string)
    raise ValueError(f"Unsupported datatype: {datatype}")
