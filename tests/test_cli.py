import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_finetune_cli_synthetic(tmp_path, capsys):
    """End-to-end CLI: train a tiny agent on fixtures, validate, select
    a best checkpoint, write metrics + records + checkpoints."""
    from vln_hamt_tpu.run.finetune import main

    out = str(tmp_path / "run")
    main(["--task", "r2r", "--synthetic", "--tiny", "--iters", "6",
          "--log_every", "3", "--output_dir", out, "--feedback", "teacher"])
    printed = capsys.readouterr().out
    best = json.loads(printed.strip().splitlines()[-1])["best"]
    assert np.isfinite(best["score"])
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.exists(os.path.join(out, "latest.pkl"))
    assert os.path.exists(os.path.join(out, "best_val_unseen.pkl"))
    assert os.path.exists(os.path.join(out, "train.txt"))
    assert os.path.exists(os.path.join(out, "training_config.json"))
    # metrics lines are valid JSON with val scores
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert any("val_unseen/sr" in l for l in lines)


@pytest.mark.slow
def test_pretrain_cli_synthetic(tmp_path, capsys):
    from vln_hamt_tpu.run.pretrain import main

    out = str(tmp_path / "pt")
    main(["--synthetic", "--tiny", "--num_steps", "4", "--valid_steps", "4",
          "--batch_size", "2", "--max_hist_len", "4", "--max_txt_len", "24",
          "--tasks", "sap", "sar", "--mix_ratio", "1", "1",
          "--output_dir", out])
    printed = capsys.readouterr().out
    assert json.loads(printed.strip().splitlines()[-1])["final_step"] == 4
    assert os.path.exists(os.path.join(out, "model_step_4.pkl"))
