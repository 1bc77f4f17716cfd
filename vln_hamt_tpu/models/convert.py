"""Torch-checkpoint conversion: reference NavCMT weights -> flax HAMT.

The reference releases torch checkpoints (``README.md:36``) saved by
``Seq2SeqCMTAgent.save`` (agent_cmt.py:607-622: top-level ``vln_bert`` /
``critic`` entries with ``state_dict``) or the pretrain ``ModelSaver``.
This module maps the reference's parameter names
(``finetune_src/models/vilmodel_cmt.py`` modules) onto our flax tree so
released weights reproduce reference outputs (see tests/test_parity.py,
which checks forward parity against the actual torch reference model).

Conventions: torch ``Linear.weight`` is (out, in) -> flax ``kernel``
(in, out) transposed; ``LayerNorm.weight`` -> ``scale``; embeddings map
1:1; the history cls token (1, 1, D) squeezes to (1, D).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _linear(tree, path, sd, torch_name):
    _set(tree, path + ("kernel",), np.asarray(sd[torch_name + ".weight"]).T)
    if torch_name + ".bias" in sd:
        _set(tree, path + ("bias",), np.asarray(sd[torch_name + ".bias"]))


def _layernorm(tree, path, sd, torch_name):
    _set(tree, path + ("scale",), np.asarray(sd[torch_name + ".weight"]))
    _set(tree, path + ("bias",), np.asarray(sd[torch_name + ".bias"]))


def _embed(tree, path, sd, torch_name):
    _set(tree, path + ("embedding",), np.asarray(sd[torch_name + ".weight"]))


def _bert_layer(tree, prefix: Tuple[str, ...], sd, torch_prefix: str) -> None:
    """BertLayer (vilmodel_cmt.py:188-201) -> TransformerLayer."""
    for qkv in ("query", "key", "value"):
        _linear(tree, prefix + ("attention", "att", qkv), sd,
                f"{torch_prefix}.attention.self.{qkv}")
    _linear(tree, prefix + ("attention", "output", "dense"), sd,
            f"{torch_prefix}.attention.output.dense")
    _layernorm(tree, prefix + ("attention", "output", "LayerNorm"), sd,
               f"{torch_prefix}.attention.output.LayerNorm")
    _linear(tree, prefix + ("ffn", "intermediate"), sd,
            f"{torch_prefix}.intermediate.dense")
    _linear(tree, prefix + ("ffn", "output"), sd,
            f"{torch_prefix}.output.dense")
    _layernorm(tree, prefix + ("ffn", "LayerNorm"), sd,
               f"{torch_prefix}.output.LayerNorm")


def _attention_block(tree, prefix: Tuple[str, ...], sd, torch_prefix: str,
                     self_attn: bool) -> None:
    """BertAttention (.self./.output.) or BertXAttention (.att./.output.)."""
    inner = "self" if self_attn else "att"
    for qkv in ("query", "key", "value"):
        _linear(tree, prefix + ("att", qkv), sd,
                f"{torch_prefix}.{inner}.{qkv}")
    _linear(tree, prefix + ("output", "dense"), sd,
            f"{torch_prefix}.output.dense")
    _layernorm(tree, prefix + ("output", "LayerNorm"), sd,
               f"{torch_prefix}.output.LayerNorm")


def convert_navcmt_state_dict(
    sd: Mapping[str, Any],
    num_l_layers: int = 9,
    num_h_layers: int = 0,
    num_r_layers: int = 0,
    num_x_layers: int = 4,
    num_h_pano_layers: int = 2,
    has_objects: bool = False,
) -> Dict:
    """Reference NavCMT state_dict -> flax HAMT params dict."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    p: Dict = {}

    # text embeddings (vilmodel_cmt.py:39-68)
    _embed(p, ("embeddings", "word_embeddings"), sd, "embeddings.word_embeddings")
    _embed(p, ("embeddings", "position_embeddings"), sd,
           "embeddings.position_embeddings")
    _embed(p, ("embeddings", "token_type_embeddings"), sd,
           "embeddings.token_type_embeddings")
    _layernorm(p, ("embeddings", "LayerNorm"), sd, "embeddings.LayerNorm")

    # language stack (LxmertEncoder.layer, :437-439)
    for i in range(num_l_layers):
        _bert_layer(p, ("lang_layers", f"layer_{i}"), sd, f"encoder.layer.{i}")
    for i in range(num_h_layers):
        _bert_layer(p, ("h_layers", f"layer_{i}"), sd, f"encoder.h_layers.{i}")
    for i in range(num_r_layers):
        _bert_layer(p, ("r_layers", f"layer_{i}"), sd, f"encoder.r_layers.{i}")

    # cross-modal stack (:450-452; LXRTXLayer :361-424)
    for i in range(num_x_layers):
        base = f"encoder.x_layers.{i}"
        pre = ("x_layer_" + str(i),)
        _attention_block(p, pre + ("visual_attention",), sd,
                         f"{base}.visual_attention", self_attn=False)
        _attention_block(p, pre + ("lang_self_att",), sd,
                         f"{base}.lang_self_att", self_attn=True)
        _attention_block(p, pre + ("visn_self_att",), sd,
                         f"{base}.visn_self_att", self_attn=True)
        _linear(p, pre + ("lang_ffn", "intermediate"), sd, f"{base}.lang_inter.dense")
        _linear(p, pre + ("lang_ffn", "output"), sd, f"{base}.lang_output.dense")
        _layernorm(p, pre + ("lang_ffn", "LayerNorm"), sd,
                   f"{base}.lang_output.LayerNorm")
        _linear(p, pre + ("visn_ffn", "intermediate"), sd, f"{base}.visn_inter.dense")
        _linear(p, pre + ("visn_ffn", "output"), sd, f"{base}.visn_output.dense")
        _layernorm(p, pre + ("visn_ffn", "LayerNorm"), sd,
                   f"{base}.visn_output.LayerNorm")

    # observation embeddings (ImageEmbeddings :498-521)
    _linear(p, ("ob_img_linear",), sd, "img_embeddings.img_linear")
    _layernorm(p, ("ob_img_ln",), sd, "img_embeddings.img_layer_norm")
    _linear(p, ("ob_ang_linear",), sd, "img_embeddings.ang_linear")
    _layernorm(p, ("ob_ang_ln",), sd, "img_embeddings.ang_layer_norm")
    _embed(p, ("ob_nav_type_embedding",), sd, "img_embeddings.nav_type_embedding")
    _layernorm(p, ("ob_ln",), sd, "img_embeddings.layer_norm")

    # history embeddings (HistoryEmbeddings :523-594)
    p["hist_cls"] = np.asarray(sd["hist_embeddings.cls_token"]).reshape(1, -1)
    _linear(p, ("hist_img_linear",), sd, "hist_embeddings.img_linear")
    _layernorm(p, ("hist_img_ln",), sd, "hist_embeddings.img_layer_norm")
    _linear(p, ("hist_ang_linear",), sd, "hist_embeddings.ang_linear")
    _layernorm(p, ("hist_ang_ln",), sd, "hist_embeddings.ang_layer_norm")
    _embed(p, ("hist_pos_embedding",), sd, "hist_embeddings.position_embeddings")
    _embed(p, ("hist_type_embedding",), sd, "hist_embeddings.type_embedding")
    _layernorm(p, ("hist_ln",), sd, "hist_embeddings.layer_norm")
    if "hist_embeddings.pano_img_linear.weight" in sd:
        _linear(p, ("hist_pano_img_linear",), sd, "hist_embeddings.pano_img_linear")
        _layernorm(p, ("hist_pano_img_ln",), sd,
                   "hist_embeddings.pano_img_layer_norm")
        _linear(p, ("hist_pano_ang_linear",), sd, "hist_embeddings.pano_ang_linear")
        _layernorm(p, ("hist_pano_ang_ln",), sd,
                   "hist_embeddings.pano_ang_layer_norm")
        for i in range(num_h_pano_layers):
            _bert_layer(p, ("pano_encoder", f"layer_{i}"), sd,
                        f"hist_embeddings.pano_encoder.layer.{i}")

    # action head (NextActionPrediction :597-607: net.0 dense, net.2 LN,
    # net.4 dense). Absent from pretrain checkpoints saved without the
    # SAP task; the reference's name-matched load leaves it random
    # (vlnbert_init.py:64-67) — so do we.
    if "next_action.net.0.weight" in sd:
        _linear(p, ("act_dense1",), sd, "next_action.net.0")
        _layernorm(p, ("act_ln",), sd, "next_action.net.2")
        _linear(p, ("act_dense2",), sd, "next_action.net.4")

    if has_objects:
        _linear(p, ("obj_img_linear",), sd, "obj_embeddings.img_linear")
        _layernorm(p, ("obj_img_ln",), sd, "obj_embeddings.img_layer_norm")
        _linear(p, ("obj_ang_linear",), sd, "obj_embeddings.ang_linear")
        _layernorm(p, ("obj_ang_ln",), sd, "obj_embeddings.ang_layer_norm")
        _linear(p, ("obj_pos_linear",), sd, "obj_embeddings.pos_linear")
        _layernorm(p, ("obj_pos_ln",), sd, "obj_embeddings.pos_layer_norm")
        _layernorm(p, ("obj_ln",), sd, "obj_embeddings.layer_norm")
        _linear(p, ("ref_dense1",), sd, "ref_object.net.0")
        _layernorm(p, ("ref_ln",), sd, "ref_object.net.2")
        _linear(p, ("ref_dense2",), sd, "ref_object.net.4")

    return p


def convert_critic_state_dict(sd: Mapping[str, Any]) -> Dict:
    """Critic (model_HAMT.py:258-269: state2value.0 / .3) -> flax."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    p: Dict = {}
    _linear(p, ("Dense_0",), sd, "state2value.0")
    _linear(p, ("Dense_1",), sd, "state2value.3")
    return p


def pretrain_to_finetune_params(pretrain_params: Mapping[str, Any]) -> Dict:
    """HAMTPretrain params -> HAMT (finetune) params.

    Parity with the reference's checkpoint surgery
    (``finetune_src/models/vlnbert_init.py:20-31``): the shared trunk
    transfers 1:1 (our pretrain model CONTAINS the finetune module as
    the ``hamt`` subtree), and the pretraining SAP head
    (``next_action``) grafts onto the fine-tuning action head.
    """
    p = dict(pretrain_params["hamt"])
    head = pretrain_params.get("next_action")
    if head is not None:
        p["act_dense1"] = head["dense1"]
        p["act_ln"] = head["ln"]
        p["act_dense2"] = head["dense2"]
    return p


def convert_reference_pretrain_state_dict(sd: Mapping[str, Any]) -> Dict:
    """Reference ``MultiStepNavCMTPreTraining`` state dict -> flax
    ``HAMTPretrain`` params (trunk + ALL task heads).

    The trunk (``bert.*`` = NavPreTrainedModel, pretrain_src/model/
    vilmodel.py:578-638 — same module names as the finetune NavCMT)
    converts through :func:`convert_navcmt_state_dict` into the
    ``hamt`` subtree. Heads (pretrain_cmt.py:73-99):

    - ``mlm_head.predictions`` (BertOnlyMLMHead, vilmodel.py:288-295;
      decoder tied to the word embeddings so only transform + bias
      carry weights)
    - ``next_action`` / ``regress_action`` / ``sprel_head``
      (Sequential net.0 dense / net.2 LN / net.4 dense, :13-47)
    - ``image_classifier`` / ``itm_head`` (no dropout: net.0 / net.2 /
      net.3, :49-71)

    Heads absent from the checkpoint (tasks not in
    ``config.pretrain_tasks``) are left out — merge over random init.
    """
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in sd.items()}
    trunk = {k[len("bert."):]: v for k, v in sd.items()
             if k.startswith("bert.")}
    p: Dict = {"hamt": convert_navcmt_state_dict(
        trunk, **_detect_navcmt_dims(trunk))}

    if "mlm_head.predictions.transform.dense.weight" in sd:
        mh: Dict = {}
        _linear(mh, ("transform_dense",), sd,
                "mlm_head.predictions.transform.dense")
        _layernorm(mh, ("transform_ln",), sd,
                   "mlm_head.predictions.transform.LayerNorm")
        mh["bias"] = np.asarray(sd["mlm_head.predictions.bias"])
        p["mlm_head"] = mh
    for name, last in (("next_action", 4), ("regress_action", 4),
                       ("sprel_head", 4), ("image_classifier", 3),
                       ("itm_head", 3)):
        if f"{name}.net.0.weight" in sd:
            h: Dict = {}
            _linear(h, ("dense1",), sd, f"{name}.net.0")
            _layernorm(h, ("ln",), sd, f"{name}.net.2")
            _linear(h, ("dense2",), sd, f"{name}.net.{last}")
            p[name] = h
    return p


def convert_hf_bert_state_dict(sd: Mapping[str, Any],
                               num_l_layers: int = 9) -> Dict:
    """HuggingFace bert-base-uncased state_dict -> partial HAMT params.

    Initializes the text embeddings + the first ``num_l_layers``
    encoder layers (the reference's BERT init path,
    ``pretrain_src/main_r2r.py:131-144``). Returns a partial tree to be
    merged over randomly-initialized params.
    """
    sd = {k.replace("bert.", ""): v for k, v in sd.items()}
    p: Dict = {}
    _embed(p, ("embeddings", "word_embeddings"), sd, "embeddings.word_embeddings")
    _embed(p, ("embeddings", "position_embeddings"), sd,
           "embeddings.position_embeddings")
    _embed(p, ("embeddings", "token_type_embeddings"), sd,
           "embeddings.token_type_embeddings")
    _layernorm(p, ("embeddings", "LayerNorm"), sd, "embeddings.LayerNorm")
    for i in range(num_l_layers):
        _bert_layer(p, ("lang_layers", f"layer_{i}"), sd, f"encoder.layer.{i}")
    return p


def convert_hf_xlmr_state_dict(sd: Mapping[str, Any],
                               num_l_layers: int = 9,
                               max_position_embeddings: Optional[int] = None
                               ) -> Dict:
    """HuggingFace xlm-roberta-base -> partial HAMT params (RxR text).

    Mirrors the reference's XLM init (``pretrain_src/main_r2r.py:
    131-143``): parameters are name-matched like BERT, and the single
    token-type embedding row is duplicated to 2 ("the second is for
    image embedding"). XLM-R's position table has a +2 padding offset
    (514 rows); the reference's name-matched load silently skips it on
    shape mismatch — we do the same (leave random init) unless the row
    count already matches.
    """
    import numpy as np

    sd = {k.replace("roberta.", ""): v for k, v in sd.items()}
    p = convert_hf_bert_state_dict(sd, num_l_layers)
    emb = p["embeddings"]
    tte = np.asarray(emb["token_type_embeddings"]["embedding"])
    if tte.shape[0] == 1:
        emb["token_type_embeddings"]["embedding"] = np.concatenate(
            [tte, tte], axis=0)
    pos = np.asarray(emb["position_embeddings"]["embedding"])
    if (max_position_embeddings is not None
            and pos.shape[0] != max_position_embeddings):
        del emb["position_embeddings"]  # shape mismatch -> keep random
    return p


def convert_vit_state_dict(sd: Mapping[str, Any], num_layers: int = 12,
                           num_heads: int = 12,
                           grid: Optional[Tuple[int, int]] = None,
                           patch_size: int = 16) -> Dict:
    """timm/torch ViT-B/16 state_dict -> flax ``vision/vit.py`` params.

    Implements the reference's checkpoint-ingestion semantics
    (``pretrain_src/model/vision_transformer.py:399-434``
    ``checkpoint_filter_fn`` + ``resize_pos_embed``, used by
    ``preprocess/precompute_img_features_vit.py:69-77``):

    - DeiT-style ``{'model': ...}`` wrappers unwrapped, DDP ``module.``
      prefixes stripped;
    - pre-conv patchify weights reshaped to conv form;
    - position embeddings bilinearly resized when ``grid`` (target
      patch grid) differs from the checkpoint's.

    The fused torch ``qkv`` (3D, D) projection splits into flax
    per-head query/key/value kernels (D, H, Dh); the output projection
    transposes into (H, Dh, D). ``head`` is converted when present.
    """
    if "model" in sd and not hasattr(sd["model"], "shape"):
        sd = sd["model"]  # DeiT checkpoints (checkpoint_filter_fn)
    if "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]
    sd = {(k[7:] if k.startswith("module.") else k): np.asarray(v)
          for k, v in sd.items()}

    tree: Dict = {}
    w = sd["patch_embed.proj.weight"]
    if w.ndim < 4:  # pre-conv patchify checkpoints
        w = w.reshape(w.shape[0], -1, patch_size, patch_size)
    # torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)
    _set(tree, ("patch_embed", "kernel"), w.transpose(2, 3, 1, 0))
    _set(tree, ("patch_embed", "bias"), sd["patch_embed.proj.bias"])
    _set(tree, ("cls_token",), sd["cls_token"])

    pos = sd["pos_embed"]
    if grid is not None and pos.shape[1] != grid[0] * grid[1] + 1:
        import jax.numpy as jnp

        from ..vision.vit import resize_pos_embed

        old = int(round((pos.shape[1] - 1) ** 0.5))
        pos = np.asarray(resize_pos_embed(jnp.asarray(pos), tuple(grid),
                                          (old, old)))
    _set(tree, ("pos_embed",), pos)

    d = sd["cls_token"].shape[-1]
    dh = d // num_heads
    for i in range(num_layers):
        tp = f"blocks.{i}"
        pre = (f"block_{i}",)
        _layernorm(tree, pre + ("norm1",), sd, f"{tp}.norm1")
        _layernorm(tree, pre + ("norm2",), sd, f"{tp}.norm2")
        qkv_w = sd[f"{tp}.attn.qkv.weight"]  # (3D, D) fused
        qkv_b = sd.get(f"{tp}.attn.qkv.bias")
        for j, name in enumerate(("query", "key", "value")):
            wj = qkv_w[j * d:(j + 1) * d]  # (D_out, D_in)
            _set(tree, pre + ("attn", name, "kernel"),
                 wj.T.reshape(d, num_heads, dh))
            if qkv_b is not None:
                _set(tree, pre + ("attn", name, "bias"),
                     qkv_b[j * d:(j + 1) * d].reshape(num_heads, dh))
        _set(tree, pre + ("attn", "out", "kernel"),
             sd[f"{tp}.attn.proj.weight"].T.reshape(num_heads, dh, d))
        _set(tree, pre + ("attn", "out", "bias"), sd[f"{tp}.attn.proj.bias"])
        _linear(tree, pre + ("mlp_fc1",), sd, f"{tp}.mlp.fc1")
        _linear(tree, pre + ("mlp_fc2",), sd, f"{tp}.mlp.fc2")
    _layernorm(tree, ("norm",), sd, "norm")
    if "head.weight" in sd:
        _linear(tree, ("head",), sd, "head")
    return tree


def load_vit_checkpoint(path: str, model) -> Dict:
    """Load a torch/timm ViT checkpoint file into params for ``model``
    (a ``vision.vit.ViT``). Handles ``.pth/.pt`` torch files and ``.npz``
    numpy archives of the raw state dict."""
    cfg = model.config
    if path.endswith(".npz"):
        sd: Mapping[str, Any] = dict(np.load(path))
    else:
        import torch

        blob = torch.load(path, map_location="cpu", weights_only=False)
        sd = blob if isinstance(blob, dict) else blob.state_dict()
    return convert_vit_state_dict(sd, num_layers=cfg.num_layers,
                                  num_heads=cfg.num_heads, grid=cfg.grid,
                                  patch_size=cfg.patch_size)


def merge_params(base: Dict, override: Dict) -> Dict:
    """Deep-merge override into a copy of base (leaves replaced)."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out


def merge_matching_params(base: Dict, override: Dict):
    """``merge_params`` with the reference's strict=False load
    semantics (HF ``from_pretrained(state_dict=...)`` name-matching,
    ``vlnbert_init.py:64-67``): override leaves replace base leaves
    only when the leaf exists in base with the same shape; everything
    else is skipped and reported. Returns ``(merged, skipped_paths)``."""
    skipped: list = []

    def rec(b: Dict, o: Dict, path: Tuple[str, ...]) -> Dict:
        out = dict(b)
        for k, v in o.items():
            here = path + (str(k),)
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = rec(out[k], v, here)
            elif k not in out or isinstance(v, dict) or isinstance(out[k], dict):
                skipped.append(".".join(here))
            elif tuple(np.shape(out[k])) != tuple(np.shape(v)):
                skipped.append(".".join(here))
            else:
                out[k] = v
        return out

    return rec(dict(base), override, ()), skipped


def _detect_navcmt_dims(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Infer the NavCMT stack depths + object-head presence from a
    torch state dict's key names (so released checkpoints of any
    configured depth convert without hand-passed dims)."""
    def depth(pat: str) -> int:
        rex = re.compile(pat)
        mx = -1
        for k in sd:
            m = rex.match(k)
            if m:
                mx = max(mx, int(m.group(1)))
        return mx + 1

    return dict(
        num_l_layers=depth(r"encoder\.layer\.(\d+)\."),
        num_h_layers=depth(r"encoder\.h_layers\.(\d+)\."),
        num_r_layers=depth(r"encoder\.r_layers\.(\d+)\."),
        num_x_layers=depth(r"encoder\.x_layers\.(\d+)\."),
        num_h_pano_layers=depth(r"hist_embeddings\.pano_encoder\.layer\.(\d+)\."),
        has_objects="obj_embeddings.img_linear.weight" in sd,
    )


def load_reference_checkpoint(path: str):
    """Load a reference torch checkpoint and convert to flax params.

    Handles BOTH released formats:

    - agent checkpoints saved by ``Seq2SeqCMTAgent.save``
      (``agent_cmt.py:607-622``: ``{'vln_bert': {'state_dict': ...},
      'critic': ...}``) -> ``(navcmt_params, critic_params)``;
    - pretrain ``ModelSaver`` state dicts (the released
      ``--bert_ckpt_file`` files): the reference remaps ``module.``
      prefixes and re-roots ``bert.*`` / top-level ``next_action.*``
      onto NavCMT (``vlnbert_init.py:20-31``) -> ``(navcmt_params,
      None)``.

    Stack depths and the object head are auto-detected from key names.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "vln_bert" in blob:
        # the agent saves the WRAPPER's state dict (VLNBertCMT /
        # NavRefModel, whose inner module is named ``vln_bert``:
        # model_HAMT.py:13 / model_navref.py:79), optionally under a
        # DDP ``module.`` prefix — strip both layers
        def strip(k: str) -> str:
            if k.startswith("module."):
                k = k[len("module."):]
            if k.startswith("vln_bert."):
                k = k[len("vln_bert."):]
            return k

        vln_sd = {strip(k): np.asarray(v)
                  for k, v in blob["vln_bert"]["state_dict"].items()}
        critic = None
        if "critic" in blob:
            critic = convert_critic_state_dict(
                {k: np.asarray(v)
                 for k, v in blob["critic"]["state_dict"].items()})
        return (convert_navcmt_state_dict(vln_sd, **_detect_navcmt_dims(vln_sd)),
                critic)

    # pretrain ModelSaver state dict (vlnbert_init.py:20-31 remap)
    sd: Dict[str, Any] = {}
    for k, v in blob.items():
        if k.startswith("module."):
            k = k[7:]
        if k.startswith("bert."):
            sd[k[5:]] = np.asarray(v)
        elif k.startswith("next_action"):
            sd[k] = np.asarray(v)
        # other pretrain heads (mlm/itm/...) have no finetune twin
    return convert_navcmt_state_dict(sd, **_detect_navcmt_dims(sd)), None
