"""Multi-process worker driving the ACTUAL fine-tune CLI.

Unlike ``mp_worker.py`` (which builds the agent by hand), this runs
``vln_hamt_tpu.run.finetune.main`` — the production entry point — under
a real ``jax.distributed`` CPU cluster, validating the whole CLI path:
identical-seed env replicas on every process (run/finetune.py's
identical-replica contract), mesh construction from ``--data_shards``,
merged 'sample' updates, device greedy eval with cross-process decode,
and model selection. The single-process run on the same total device
count is the parity oracle.

Invocation (by test_multiprocess.py, never by pytest collection):
    python tests/finetune_mp_worker.py <port> <pid> <nprocs> <out.json> \
        <output_dir>
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache shared with conftest (test-tier speedup)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main() -> None:
    port, pid, nprocs, out_path, outdir = sys.argv[1:6]
    pid, nprocs = int(pid), int(nprocs)
    if nprocs > 1:
        from vln_hamt_tpu.parallel.mesh import init_distributed

        init_distributed(f"localhost:{port}", num_processes=nprocs,
                         process_id=pid)
        assert jax.process_count() == nprocs

    import contextlib
    import io

    from vln_hamt_tpu.parallel.mesh import is_default_process
    from vln_hamt_tpu.run.finetune import main as finetune_main

    assert jax.device_count() == 2, jax.devices()

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        finetune_main([
            "--task", "r2r", "--synthetic", "--tiny",
            "--iters", "4", "--log_every", "2",
            "--feedback", "sample", "--data_shards", "2",
            "--output_dir", outdir,
        ])
    best = json.loads(buf.getvalue().strip().splitlines()[-1])["best"]

    if is_default_process():  # MetricsLogger is rank-0 gated
        losses = []
        with open(f"{outdir}/metrics.jsonl") as f:
            for line in f:
                rec = json.loads(line)
                if "loss" in rec:
                    losses.append(rec["loss"])
        with open(out_path, "w") as f:
            json.dump({"best": best, "losses": losses,
                       "process_count": jax.process_count()}, f)
    print(f"finetune worker {pid}/{nprocs} done", flush=True)


if __name__ == "__main__":
    main()
