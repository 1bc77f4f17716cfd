"""Analytic matmul-FLOPs model + MFU accounting for the HAMT programs.

The standard MFU numerator: dense/attention matmul FLOPs of one update
(forward + backward = 3x forward), excluding remat recompute (overhead,
not useful work) and elementwise ops (LN/softmax/optimizer — they run
on the VPU, not the MXU). XLA's compiled ``cost_analysis()`` cannot be
used for this: HloCostAnalysis counts a While body ONCE, so the episode
``lax.scan`` (T iterations) is undercounted by ~T x (verified exact on
a plain matmul, ~10x low on the scan — see bench.py).

Used by ``bench.py`` and the fine-tune CLI's throughput logging.
"""

from __future__ import annotations

# bf16 peak FLOP/s by device kind (jax Device.device_kind substrings)
_PEAK_BF16 = {
    "v5 lite": 197e12,  # TPU v5e
    "v5litepod": 197e12,
    "v4": 275e12,
    "v5p": 459e12,
    "v6 lite": 918e12,  # Trillium
}
DEFAULT_PEAK_BF16 = 197e12


def chip_peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in _PEAK_BF16.items():
        if sub in kind:
            return peak
    return DEFAULT_PEAK_BF16


def analytic_update_flops(cfg, batch: int, n_ob: int,
                          n_obj: int = 0) -> float:
    """Matmul FLOPs of one IL update (fwd + bwd = 3x fwd) at ``batch``
    lanes.

    Per-step token counts: visual stream = (T+1) history tokens + n_ob
    obs tokens (+ n_obj REVERIE object tokens); language stream = L
    instruction tokens. Per token per transformer layer: QKVO 4D^2 MACs
    + FFN 2*D*I MACs (+ attention score/value matmuls 2*Lk*D). Cross
    layers add the Q/O and K/V splits across the two streams
    (models/layers.py:CrossModalLayer == vilmodel_cmt.py:361-424).

    The merged 'sample' update (PARITY.md #18) runs IL + RL as 2B lanes
    through the same per-step transformer — call with ``2 * batch``.
    """
    m = cfg.model
    d = m.hidden_size
    d2 = float(d * d)
    ffn = 2.0 * d * m.intermediate_size
    L = cfg.env.max_instr_len
    T = cfg.env.max_action_len
    n_v = (T + 1) + n_ob + n_obj

    # text encode: num_l_layers self-attn layers over L tokens
    per_tok_self = 4 * d2 + ffn
    text = m.num_l_layers * L * (per_tok_self + 2.0 * L * d)

    # one scan step: cross-modal x-layers over (visn | lang)
    visn = (4 * d2 * n_v + 2.0 * n_v * n_v * d      # self-attn
            + 2 * d2 * n_v + 2 * d2 * L             # cross Q/O + K/V
            + 2.0 * n_v * L * d                     # cross scores/values
            + ffn * n_v)
    lang = (4 * d2 * L + 2.0 * L * L * d
            + 2 * d2 * L + 2 * d2 * n_v
            + 2.0 * L * n_v * d
            + ffn * L)
    xstep = m.num_x_layers * (visn + lang)

    # per-step history token: pano transformer over 36 views + linears
    pano = m.num_h_pano_layers * 36 * (per_tok_self + 2.0 * 36 * d)
    pano += 36 * (m.image_feat_size * d + m.angle_feat_size * d)
    head = (n_ob + n_obj) * (d2 + d)  # action/obj heads (critic ~d*512)

    fwd_macs = batch * (text + T * (xstep + pano + head))
    return 3.0 * 2.0 * fwd_macs  # x2 MAC->FLOP, x3 fwd+bwd
