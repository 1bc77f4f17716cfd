"""Instruction / annotation loading for all supported datasets.

Parity with ``finetune_src/r2r/data_utils.py:26-83`` (R2R family + RxR),
``finetune_src/reverie/data_utils.py:45-88`` and ``finetune_src/cvdn/
main.py:24-31``. One output item per (path, instruction) with
pre-tokenized ``instr_encoding`` clipped to ``max_instr_len``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence


def _read_json(path: str):
    with open(path) as f:
        return json.load(f)


def _read_jsonl(path: str):
    items = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                items.append(json.loads(line))
    return items


def load_instr_datasets(anno_dir: str, dataset: str, splits: Sequence[str]) -> List[dict]:
    """Raw per-split annotation loading (data_utils.py:26-54).

    A split containing '/' is treated as a path to augmented data.
    """
    data: List[dict] = []
    for split in splits:
        if "/" in split:  # augmented data file path
            data += _read_json(split)
            continue
        if dataset == "r2r":
            data += _read_json(os.path.join(anno_dir, f"R2R_{split}_enc.json"))
        elif dataset == "r2r_last":
            data += _read_json(os.path.join(anno_dir, "LastSent", f"R2R_{split}_enc.json"))
        elif dataset == "r2r_back":
            data += _read_json(os.path.join(anno_dir, "ReturnBack", f"R2R_{split}_enc.json"))
        elif dataset == "r4r":
            data += _read_json(os.path.join(anno_dir, f"R4R_{split}_enc.json"))
        elif dataset == "rxr":
            data += _read_jsonl(os.path.join(anno_dir, f"rxr_{split}_guide_enc_xlmr.jsonl"))
        elif dataset == "reverie":
            data += _read_json(os.path.join(anno_dir, f"REVERIE_{split}_enc.json"))
        elif dataset == "cvdn":
            data += _read_json(os.path.join(anno_dir, f"{split}_enc.json"))
        else:
            raise ValueError(f"unknown dataset {dataset!r}")
    return data


def construct_instrs(
    anno_dir: str,
    dataset: str,
    splits: Sequence[str],
    max_instr_len: int = 512,
) -> List[dict]:
    """One entry per (path, instruction) (data_utils.py:56-83).

    RxR items are already per-instruction; the R2R family expands the
    ``instructions``/``instr_encodings`` lists.
    """
    out: List[dict] = []
    for item in load_instr_datasets(anno_dir, dataset, splits):
        if dataset == "rxr":
            new_item = dict(item)
            if "path_id" in item:
                new_item["instr_id"] = f"{item['path_id']}_{item['instruction_id']}"
            else:  # test split
                new_item["path_id"] = new_item["instr_id"] = str(item["instruction_id"])
            new_item["instr_encoding"] = item["instr_encoding"][:max_instr_len]
            out.append(new_item)
        else:
            for j, instr in enumerate(item["instructions"]):
                new_item = dict(item)
                new_item["instr_id"] = f"{item['path_id']}_{j}"
                new_item["instruction"] = instr
                new_item["instr_encoding"] = item["instr_encodings"][j][:max_instr_len]
                del new_item["instructions"]
                del new_item["instr_encodings"]
                out.append(new_item)
    return out
