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
def test_finetune_cli_aug_packed_il(tmp_path, capsys):
    """GT/aug interval alternation (main.py:146-161; --aug builds a
    fixture aug env under --synthetic) combined with --packed_il:
    per-env packers keep the two episode queues separate and the run
    trains more episodes per update than the plain batch."""
    from vln_hamt_tpu.run.finetune import main

    out = str(tmp_path / "run")
    main(["--task", "r2r", "--synthetic", "--tiny", "--iters", "6",
          "--log_every", "6", "--output_dir", out, "--feedback",
          "teacher", "--aug", "synthetic", "--packed_il",
          "--batch_size", "4"])
    printed = capsys.readouterr().out
    best = json.loads(printed.strip().splitlines()[-1])["best"]
    assert np.isfinite(best["score"])
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    train_lines = [l for l in lines if "loss" in l]
    assert train_lines and all(np.isfinite(l["loss"]) for l in train_lines)


@pytest.mark.slow
def test_finetune_cli_valid_only_submit(tmp_path, capsys):
    """Stand-alone validation + submission dumps (main.py:225-269):
    train briefly, then --valid_only --submit must evaluate the GT
    splits, skip metrics on the GT-less test split, and write
    well-formed submit_{split}.json files."""
    from vln_hamt_tpu.run.finetune import main

    out = str(tmp_path / "run")
    main(["--task", "r2r", "--synthetic", "--tiny", "--iters", "3",
          "--log_every", "3", "--output_dir", out, "--feedback", "teacher"])
    capsys.readouterr()

    val_out = str(tmp_path / "valid")
    main(["--task", "r2r", "--synthetic", "--tiny", "--valid_only",
          "--submit", "--resume_file", os.path.join(out, "latest.pkl"),
          "--output_dir", val_out])
    printed = capsys.readouterr().out
    results = json.loads(printed.strip().splitlines()[-1])["valid"]
    assert "val_unseen" in results and np.isfinite(results["val_unseen"]["sr"])
    assert "test" not in results  # GT-less split: no metrics
    for split in ("val_unseen", "test"):
        path = os.path.join(val_out, f"submit_{split}.json")
        assert os.path.exists(path), path
        preds = json.load(open(path))
        assert preds and all(
            {"instr_id", "trajectory"} <= set(p) for p in preds)
        # trajectory entries are [viewpoint, heading, elevation]
        assert all(len(step) == 3 for p in preds for step in p["trajectory"])
    assert os.path.exists(os.path.join(val_out, "valid.txt"))


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
    # dual seen/unseen validation streams (main_r2r.py:303-308): both
    # setnames are validated per task at every valid point
    with open(os.path.join(out, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    keys = {k for r in recs for k in r}
    for name in ("seen", "unseen"):
        for task in ("sap", "sar"):
            assert any(k.startswith(f"val_{name}/{task}/") for k in keys), (
                name, task, keys)


def test_val_spec_parsing():
    """--val_traj_files accepts plain paths or name=path pairs."""
    from vln_hamt_tpu.run.pretrain import parse_val_specs

    assert parse_val_specs(["a.jsonl", "b.jsonl"]) == {
        "val": ["a.jsonl", "b.jsonl"]}
    assert parse_val_specs(
        ["seen=a.jsonl", "unseen=b.jsonl", "seen=c.jsonl"]) == {
        "seen": ["a.jsonl", "c.jsonl"], "unseen": ["b.jsonl"]}


@pytest.mark.slow
def test_pretrain_cli_rxr_preset(tmp_path, capsys):
    """--preset rxr (pretrain_rxr.json): candidate-first observations,
    xlmr-style config, no MRC in the default task set."""
    from vln_hamt_tpu.run.pretrain import main

    out = str(tmp_path / "rxr")
    main(["--preset", "rxr", "--synthetic", "--tiny", "--num_steps", "2",
          "--valid_steps", "2", "--batch_size", "2", "--max_hist_len", "3",
          "--max_txt_len", "16", "--tasks", "sap", "sar",
          "--mix_ratio", "1", "1", "--output_dir", out])
    printed = capsys.readouterr().out
    assert json.loads(printed.strip().splitlines()[-1])["final_step"] == 2


@pytest.mark.slow
def test_pretrain_cli_bert_init_and_resume(tmp_path, capsys):
    """Initialization pathways (main_r2r.py:131-148): trunk init from a
    real (tiny) HF BERT state dict, rangerlars optimizer routing, and
    resuming a saved run."""
    import pickle

    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from vln_hamt_tpu.run.pretrain import main

    bert = BertModel(BertConfig(
        vocab_size=30522, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=128))
    bert_path = str(tmp_path / "bert.pt")
    torch.save(bert.state_dict(), bert_path)

    out = str(tmp_path / "pt")
    common = ["--synthetic", "--tiny", "--valid_steps", "2",
              "--batch_size", "2", "--max_hist_len", "4",
              "--max_txt_len", "24", "--tasks", "mlm", "--mix_ratio", "1",
              "--optim", "rangerlars", "--output_dir", out]
    main(["--num_steps", "2", "--bert_init", bert_path] + common)
    printed = capsys.readouterr().out
    assert json.loads(printed.strip().splitlines()[-1])["final_step"] == 2

    # the HF word embeddings landed in the trunk (lr is ~0 during the
    # 2-step warmup slice, so they are near-unchanged in the checkpoint)
    with open(os.path.join(out, "model_step_2.pkl"), "rb") as f:
        blob = pickle.load(f)
    got = np.asarray(
        blob["params"]["hamt"]["embeddings"]["word_embeddings"]["embedding"])
    want = bert.state_dict()["embeddings.word_embeddings.weight"].numpy()
    np.testing.assert_allclose(got, want, atol=1e-3)

    main(["--num_steps", "4",
          "--resume", os.path.join(out, "model_step_2.pkl")] + common)
    printed = capsys.readouterr().out
    assert json.loads(printed.strip().splitlines()[-1])["final_step"] == 4
    assert os.path.exists(os.path.join(out, "model_step_4.pkl"))


@pytest.mark.slow
def test_finetune_cli_init_pretrain(tmp_path, capsys):
    """The core pretrain -> fine-tune pipeline (the reference's
    --bert_ckpt_file recipe, vlnbert_init.py:20-31): a run/pretrain.py
    checkpoint must initialize run/finetune.py's trunk and graft the
    SAP head onto the action head."""
    import pickle

    from vln_hamt_tpu.run.finetune import main as finetune_main
    from vln_hamt_tpu.run.pretrain import main as pretrain_main

    pt = str(tmp_path / "pt")
    pretrain_main(["--synthetic", "--tiny", "--num_steps", "2",
                   "--valid_steps", "2", "--batch_size", "2",
                   "--max_hist_len", "4", "--max_txt_len", "24",
                   "--tasks", "sap", "--mix_ratio", "1",
                   "--output_dir", pt])
    capsys.readouterr()
    ckpt = os.path.join(pt, "model_step_2.pkl")
    with open(ckpt, "rb") as f:
        pp = pickle.load(f)["params"]

    ft = str(tmp_path / "ft")
    # lr 0 freezes training so latest.pkl must equal the initialization
    finetune_main(["--task", "r2r", "--synthetic", "--tiny",
                   "--iters", "2", "--log_every", "2",
                   "--feedback", "teacher", "--lr", "0",
                   "--init_pretrain", ckpt, "--output_dir", ft])
    printed = capsys.readouterr().out
    assert "initialized weights from" in printed
    with open(os.path.join(ft, "latest.pkl"), "rb") as f:
        fp = pickle.load(f)["params"]
    np.testing.assert_allclose(
        np.asarray(fp["embeddings"]["word_embeddings"]["embedding"]),
        np.asarray(pp["hamt"]["embeddings"]["word_embeddings"]["embedding"]))
    # the SAP head landed on the fine-tune action head
    np.testing.assert_allclose(
        np.asarray(fp["act_dense1"]["kernel"]),
        np.asarray(pp["next_action"]["dense1"]["kernel"]))


@pytest.mark.slow
def test_image_pretrain_cli_synthetic(tmp_path, capsys):
    """The e2e image-pretraining orchestrator (main_r2r_image.py parity):
    ViT-in-the-loop training at batch 1 with gradient accumulation."""
    from vln_hamt_tpu.run.image_pretrain import main

    out = str(tmp_path / "ipt")
    main(["--synthetic", "--tiny", "--num_steps", "3", "--valid_steps", "3",
          "--batch_size", "1", "--grad_accum", "2",
          "--max_hist_len", "3", "--max_txt_len", "16",
          "--tasks", "mlm", "sap", "--mix_ratio", "1", "1",
          "--output_dir", out])
    printed = capsys.readouterr().out
    assert json.loads(printed.strip().splitlines()[-1])["final_step"] == 3
    assert os.path.exists(os.path.join(out, "model_step_3.pkl"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))


@pytest.mark.slow
def test_image_pretrain_cli_device_bench(tmp_path, capsys):
    """--device_bench: compute-bound ex/s of the ViT-in-the-loop update
    with the batch resident in device memory (the featurizer
    --device_bench methodology), one JSON line, no checkpoints."""
    from vln_hamt_tpu.run.image_pretrain import main

    out = str(tmp_path / "iptb")
    main(["--synthetic", "--tiny", "--device_bench", "2",
          "--batch_size", "1", "--max_hist_len", "3", "--max_txt_len", "16",
          "--tasks", "mlm", "sap", "--mix_ratio", "1", "1",
          "--output_dir", out])
    printed = capsys.readouterr().out
    rec = json.loads(printed.strip().splitlines()[-1])
    assert rec["device_bench_iters"] == 2
    for task in ("mlm", "sap"):
        assert rec["ex_per_sec_compute_bound"][task] > 0
    assert not os.path.exists(os.path.join(out, "metrics.jsonl"))


@pytest.mark.slow
def test_finetune_cli_variant_presets(tmp_path, capsys):
    """The r4r, rxr and r2r_last presets run the full synthetic
    pipeline end to end — rxr exercises the XLM-R path (250k vocab,
    duplicated type embedding, no_lang_ca; scripts/run_rxr.sh) through training
    + device eval + model selection; r2r_last is the LastSent
    config-only variant over R2RNavEnv (scripts/run_r2r_last.sh)."""
    from vln_hamt_tpu.run.finetune import main

    for task in ("r4r", "rxr", "r2r_last"):
        out = str(tmp_path / task)
        main(["--task", task, "--synthetic", "--tiny", "--iters", "2",
              "--log_every", "2", "--output_dir", out,
              "--feedback", "teacher"])
        printed = capsys.readouterr().out
        best = json.loads(printed.strip().splitlines()[-1])["best"]
        assert np.isfinite(best["score"]), task
        assert os.path.exists(os.path.join(out, "latest.pkl"))


@pytest.mark.slow
def test_finetune_cli_orbax_checkpoints(tmp_path, capsys):
    """--orbax_ckpt writes async directory checkpoints; --resume_file
    auto-detects the format for valid-only evaluation."""
    from vln_hamt_tpu.run.finetune import main

    out = str(tmp_path / "orun")
    main(["--task", "r2r", "--synthetic", "--tiny", "--iters", "4",
          "--log_every", "2", "--output_dir", out, "--feedback", "teacher",
          "--orbax_ckpt"])
    capsys.readouterr()
    latest = os.path.join(out, "latest")
    assert os.path.isdir(latest)
    assert os.path.isdir(os.path.join(out, "best_val_unseen"))
    main(["--task", "r2r", "--synthetic", "--tiny", "--valid_only",
          "--resume_file", latest, "--output_dir", str(tmp_path / "oval")])
    printed = capsys.readouterr().out
    results = json.loads(printed.strip().splitlines()[-1])["valid"]
    assert np.isfinite(results["val_unseen"]["sr"])


@pytest.mark.slow
def test_finetune_cli_task_variants(tmp_path, capsys):
    """cvdn, r2r_back and reverie run the full synthetic CLI pipeline
    (train -> device eval -> model selection -> checkpoints) — the
    reference's three task-specific main.py twins."""
    from vln_hamt_tpu.run.finetune import main

    for task in ("cvdn", "r2r_back", "reverie"):
        out = str(tmp_path / task)
        main(["--task", task, "--synthetic", "--tiny", "--iters", "2",
              "--log_every", "2", "--output_dir", out,
              "--feedback", "teacher"])
        printed = capsys.readouterr().out
        best = json.loads(printed.strip().splitlines()[-1])["best"]
        assert np.isfinite(best["score"]), task
        assert os.path.exists(os.path.join(out, "latest.pkl"))
