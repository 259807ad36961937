"""PyTorch → JAX checkpoint translation.

Loads the reference's released checkpoints (``pretrained_models/*.pth``,
``egot2_checkpoints/*.ckpt`` — README.md:43,106,178) and rewrites their
state_dicts into egot2x variable trees for bit-parity evaluation
(BASELINE.json north star).

Tensor layout transforms:
  * Conv2d  (O, I, H, W)      → HWIO (H, W, I, O)
  * Conv3d  (O, I, T, H, W)   → (T, H, W, I, O)
  * Conv1d  (O, I, K)         → (K, I, O)
  * depthwise Conv1d (C,1,K)  → (K, 1, C)
  * Linear  (out, in)         → (in, out)
  * BatchNorm weight/bias     → batch_stats-adjacent scale/bias;
    running_mean/var           → batch_stats mean/var
  * LSTM weight_ih/hh (4H, D) → (D, 4H) (gate order preserved)
  * MultiheadAttention in_proj (3D, D) → split q/k/v (D, D) kernels

Name maps cover the reference model families: torchvision-style
ResNet-18 (+fc2), BiLSTM heads, ResNetSE, TalkNet, PySlowFast
ResNet3D/SlowFast (s{k}.pathway{p}_res{i}.branch2.{a,b,c}...), and the
Lightning prefix strippers (``model.`` / ``module.`` —
HHI/utils/utils.py:21-47, HOI/utils/multitask/load_model.py:10-116).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List

import numpy as np


# ---- tensor transforms --------------------------------------------------

def t_conv2d(w):  # (O, I, H, W) → (H, W, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def t_conv3d(w):  # (O, I, T, H, W) → (T, H, W, I, O)
    return np.transpose(w, (2, 3, 4, 1, 0))


def t_conv1d(w):  # (O, I, K) → (K, I, O)
    return np.transpose(w, (2, 1, 0))


def t_depthwise_conv1d(w):  # (C, 1, K) → (K, 1, C)
    return np.transpose(w, (2, 1, 0))


def t_linear(w):  # (out, in) → (in, out)
    return np.transpose(w, (1, 0))


def t_id(w):
    return np.asarray(w)


# ---- state dict utilities ----------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint file to {name: np.ndarray}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model_state", "model"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()
            if hasattr(v, "detach")}


def strip_prefix(state: Dict[str, np.ndarray],
                 prefixes=("module.", "model.")) -> Dict[str, np.ndarray]:
    """Strip one leading wrapper module name (reference loaders strip the
    first dotted component, HHI/utils/utils.py:28-40)."""
    out = {}
    for k, v in state.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def _set_path(tree: Dict, path: List[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _bn_rule(src: str, dst: List[str]):
    """Expand one BN mapping into the four leaf rules."""
    return [
        (src + ".weight", ("params", dst + ["scale"]), t_id),
        (src + ".bias", ("params", dst + ["bias"]), t_id),
        (src + ".running_mean", ("batch_stats", dst + ["mean"]), t_id),
        (src + ".running_var", ("batch_stats", dst + ["var"]), t_id),
    ]


def _conv_rule(src, dst, transform=t_conv2d, bias=False):
    rules = [(src + ".weight", ("params", dst + ["kernel"]), transform)]
    if bias:
        rules.append((src + ".bias", ("params", dst + ["bias"]), t_id))
    return rules


def _linear_rule(src, dst):
    return [
        (src + ".weight", ("params", dst + ["kernel"]), t_linear),
        (src + ".bias", ("params", dst + ["bias"]), t_id),
    ]


def apply_rules(state: Dict[str, np.ndarray], rules) -> Dict[str, Any]:
    """rules: list of (src_name, (collection, dst_path), transform)."""
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    used = set()
    for src, (coll, dst), transform in rules:
        if src in state:
            _set_path(out[coll], list(dst), transform(state[src]))
            used.add(src)
    out["unused"] = sorted(set(state) - used)
    return out


# ---- model family maps --------------------------------------------------

def resnet18_rules(src_prefix: str, dst_prefix: List[str]):
    """torchvision resnet18 (+fc2) → egot2x ResNet2D."""
    p = src_prefix + "." if src_prefix else ""
    rules = []
    rules += _conv_rule(p + "conv1", dst_prefix + ["conv1"])
    rules += _bn_rule(p + "bn1", dst_prefix + ["bn1"])
    for stage in range(1, 5):
        for block in range(2):
            sp = f"{p}layer{stage}.{block}"
            dp = dst_prefix + [f"layer{stage}_{block}"]
            rules += _conv_rule(sp + ".conv1", dp + ["conv1"])
            rules += _bn_rule(sp + ".bn1", dp + ["bn1"])
            rules += _conv_rule(sp + ".conv2", dp + ["conv2"])
            rules += _bn_rule(sp + ".bn2", dp + ["bn2"])
            rules += _conv_rule(sp + ".downsample.0", dp + ["downsample_conv"])
            rules += _bn_rule(sp + ".downsample.1", dp + ["downsample_bn"])
    rules += _linear_rule(p + "fc", dst_prefix + ["fc"])
    rules += _linear_rule(p + "fc2", dst_prefix + ["fc2"])
    return rules


def bilstm_rules(src_prefix: str, dst_prefix: List[str], num_layers: int = 2):
    rules = []
    p = src_prefix + "." if src_prefix else ""
    for layer in range(num_layers):
        for sfx, tag in (("", "fwd"), ("_reverse", "bwd")):
            dp = dst_prefix + [f"l{layer}_{tag}"]
            rules += [
                (f"{p}weight_ih_l{layer}{sfx}", ("params", dp + ["w_ih"]), t_linear),
                (f"{p}weight_hh_l{layer}{sfx}", ("params", dp + ["w_hh"]), t_linear),
                (f"{p}bias_ih_l{layer}{sfx}", ("params", dp + ["b_ih"]), t_id),
                (f"{p}bias_hh_l{layer}{sfx}", ("params", dp + ["b_hh"]), t_id),
            ]
    return rules


def lam_baseline_rules():
    """Reference LAM BaselineLSTM state_dict → egot2x BaselineLSTM tree
    (trunk/base_model + trunk/lstm + last_layer1/2)."""
    rules = []
    rules += resnet18_rules("base_model", ["trunk", "base_model"])
    rules += bilstm_rules("lstm", ["trunk", "lstm"])
    rules += _linear_rule("last_layer1", ["last_layer1"])
    rules += _linear_rule("last_layer2", ["last_layer2"])
    return rules


def resnetse_rules(src_prefix: str, dst_prefix: List[str]):
    p = src_prefix + "." if src_prefix else ""
    rules = []
    rules += _conv_rule(p + "conv1", dst_prefix + ["conv1"], bias=True)
    rules += _bn_rule(p + "bn1", dst_prefix + ["bn1"])
    for stage, blocks in enumerate([2, 2, 2, 2], start=1):
        for b in range(blocks):
            sp = f"{p}layer{stage}.{b}"
            dp = dst_prefix + [f"layer{stage}_{b}"]
            rules += _conv_rule(sp + ".conv1", dp + ["conv1"])
            rules += _bn_rule(sp + ".bn1", dp + ["bn1"])
            rules += _conv_rule(sp + ".conv2", dp + ["conv2"])
            rules += _bn_rule(sp + ".bn2", dp + ["bn2"])
            rules += _linear_rule(sp + ".se.fc.0", dp + ["se", "fc0"])
            rules += _linear_rule(sp + ".se.fc.2", dp + ["se", "fc1"])
            rules += _conv_rule(sp + ".downsample.0", dp + ["downsample_conv"])
            rules += _bn_rule(sp + ".downsample.1", dp + ["downsample_bn"])
    # ASP attention: Conv1d k=1 ≡ Dense
    rules += [
        (p + "attention.0.weight", ("params", dst_prefix + ["att_fc0", "kernel"]),
         lambda w: np.transpose(w[:, :, 0], (1, 0))),
        (p + "attention.0.bias", ("params", dst_prefix + ["att_fc0", "bias"]), t_id),
        (p + "attention.3.weight", ("params", dst_prefix + ["att_fc1", "kernel"]),
         lambda w: np.transpose(w[:, :, 0], (1, 0))),
        (p + "attention.3.bias", ("params", dst_prefix + ["att_fc1", "bias"]), t_id),
    ]
    rules += _bn_rule(p + "attention.2", dst_prefix + ["att_bn"])
    rules += _linear_rule(p + "fc", dst_prefix + ["fc"])
    return rules


def ttm_baseline_rules():
    rules = []
    rules += resnet18_rules("video_encoder", ["trunk", "video_encoder"])
    rules += bilstm_rules("lstm", ["trunk", "lstm"])
    rules += resnetse_rules("audio_encoder", ["trunk", "audio_encoder"])
    rules += _linear_rule("last_layer1", ["last_layer1"])
    rules += _linear_rule("last_layer2", ["last_layer2"])
    return rules


def mha_rules(src_prefix: str, dst_prefix: List[str]):
    """torch MultiheadAttention → our MultiHeadAttention q/k/v/out."""

    def split(idx):
        def f(w):
            d = w.shape[0] // 3
            return t_linear(w[idx * d:(idx + 1) * d])

        return f

    def split_b(idx):
        def f(b):
            d = b.shape[0] // 3
            return b[idx * d:(idx + 1) * d]

        return f

    p = src_prefix + "."
    rules = []
    for i, name in enumerate(["q_proj", "k_proj", "v_proj"]):
        rules.append((p + "in_proj_weight",
                      ("params", dst_prefix + [name, "kernel"]), split(i)))
        rules.append((p + "in_proj_bias",
                      ("params", dst_prefix + [name, "bias"]), split_b(i)))
    rules += _linear_rule(p + "out_proj", dst_prefix + ["out_proj"])
    return rules


def resnet3d_rules(src_prefix: str, dst_prefix: List[str],
                   stage_blocks=(3, 4, 6, 3), pathway: int = 0,
                   pathway_suffix: str = ""):
    """PySlowFast ResNet3D names → egot2x ResNet3D (single pathway)."""
    p = src_prefix + "." if src_prefix else ""
    rules = []
    rules += _conv_rule(f"{p}s1.pathway{pathway}_stem.conv",
                        dst_prefix + [f"s1{pathway_suffix}", "conv"], t_conv3d)
    rules += _bn_rule(f"{p}s1.pathway{pathway}_stem.bn",
                      dst_prefix + [f"s1{pathway_suffix}", "bn"])
    for si, blocks in enumerate(stage_blocks, start=2):
        for b in range(blocks):
            sp = f"{p}s{si}.pathway{pathway}_res{b}"
            dp = dst_prefix + [f"s{si}{pathway_suffix}", f"block{b}"]
            rules += _conv_rule(sp + ".branch1", dp + ["branch1"], t_conv3d)
            rules += _bn_rule(sp + ".branch1_bn", dp + ["branch1_bn"])
            for leaf in ("a", "b", "c"):
                rules += _conv_rule(sp + f".branch2.{leaf}",
                                    dp + ["branch2", leaf], t_conv3d)
                rules += _bn_rule(sp + f".branch2.{leaf}_bn",
                                  dp + ["branch2", f"{leaf}_bn"])
            # Nonlocal block after res-block b when enabled
            # (HOI/models/lta/resnet_helper.py:511-519 naming)
            np_ = f"{p}s{si}.pathway{pathway}_nonlocal{b}"
            nd = dst_prefix + [f"s{si}{pathway_suffix}", f"nonlocal{b}"]
            for leaf in ("conv_theta", "conv_phi", "conv_g", "conv_out"):
                rules += _conv_rule(np_ + f".{leaf}", nd + [leaf], t_conv3d,
                                    bias=True)
            rules += _bn_rule(np_ + ".bn", nd + ["bn"])
    return rules


def slowfast_rules(src_prefix: str, dst_prefix: List[str],
                   stage_blocks=(3, 4, 6, 3)):
    rules = []
    rules += resnet3d_rules(src_prefix, dst_prefix, stage_blocks, 0, "_slow")
    rules += resnet3d_rules(src_prefix, dst_prefix, stage_blocks, 1, "_fast")
    p = src_prefix + "." if src_prefix else ""
    for si in range(1, 5):
        rules += _conv_rule(f"{p}s{si}_fuse.conv_f2s",
                            dst_prefix + [f"s{si}_fuse", "conv_f2s"], t_conv3d)
        rules += _bn_rule(f"{p}s{si}_fuse.bn", dst_prefix + [f"s{si}_fuse", "bn"])
    return rules


def pnr_keyframe_rules():
    rules = resnet3d_rules("", ["trunk"])
    rules += _linear_rule("Keyframe_localisation_head.projection",
                          ["head", "projection"])
    return rules


def oscc_rules():
    rules = resnet3d_rules("", ["trunk"])
    rules += _linear_rule("State_detection_head.projection",
                          ["head", "projection"])
    return rules


def talknet_rules(dst_prefix: List[str] = []):
    """TalkNet (HHI/models/asd) state_dict → egot2x TalkNetModel tree.

    Source names per talkNetModel.py/visualEncoder.py/audioEncoder.py;
    destination names per egot2x.nn.talknet module attributes.
    """
    rules = []
    d = dst_prefix
    # visual frontend: 3D stem + AVSR resnet
    rules += _conv_rule("visualFrontend.frontend3D.0",
                        d + ["visual_frontend", "frontend3d_conv"], t_conv3d)
    rules += _bn_rule("visualFrontend.frontend3D.1",
                      d + ["visual_frontend", "frontend3d_bn"])
    for layer in range(1, 5):
        sp = f"visualFrontend.resnet.layer{layer}"
        dp = d + ["visual_frontend", f"layer{layer}"]
        for leaf in ("conv1a", "conv2a", "conv1b", "conv2b", "downsample"):
            rules += _conv_rule(f"{sp}.{leaf}", dp + [leaf])
        for bn in ("bn1a", "outbna", "bn1b", "outbnb"):
            rules += _bn_rule(f"{sp}.{bn}", dp + [bn])
    # visual TCN: Sequential(relu, bn, dwconv, prelu, gln, pwconv)
    for i in range(5):
        sp = f"visualTCN.net.{i}.net"
        dp = d + ["visual_tcn", f"block{i}"]
        rules += _bn_rule(f"{sp}.1", dp + ["bn"])
        rules += _conv_rule(f"{sp}.2", dp + ["depthwise"], t_depthwise_conv1d)
        rules += [(f"{sp}.3.weight", ("params", dp + ["prelu_alpha"]), t_id)]
        rules += [
            (f"{sp}.4.gamma", ("params", dp + ["gln", "gamma"]),
             lambda w: np.asarray(w).reshape(-1)),
            (f"{sp}.4.beta", ("params", dp + ["gln", "beta"]),
             lambda w: np.asarray(w).reshape(-1)),
        ]
        rules += _conv_rule(f"{sp}.5", dp + ["pointwise"], t_conv1d)
    # visual conv1d head
    rules += _conv_rule("visualConv1D.net.0",
                        d + ["visual_conv1d", "conv5"], t_conv1d, bias=True)
    rules += _bn_rule("visualConv1D.net.1", d + ["visual_conv1d", "bn"])
    rules += _conv_rule("visualConv1D.net.3",
                        d + ["visual_conv1d", "conv1"], t_conv1d, bias=True)
    # audio encoder: SE-ResNet [3, 4, 6, 3]
    rules += _conv_rule("audioEncoder.conv1", d + ["audio_encoder", "conv1"])
    rules += _bn_rule("audioEncoder.bn1", d + ["audio_encoder", "bn1"])
    for layer, blocks in enumerate([3, 4, 6, 3], start=1):
        for b in range(blocks):
            sp = f"audioEncoder.layer{layer}.{b}"
            dp = d + ["audio_encoder", f"layer{layer}_{b}"]
            rules += _conv_rule(sp + ".conv1", dp + ["conv1"])
            rules += _bn_rule(sp + ".bn1", dp + ["bn1"])
            rules += _conv_rule(sp + ".conv2", dp + ["conv2"])
            rules += _bn_rule(sp + ".bn2", dp + ["bn2"])
            rules += _linear_rule(sp + ".se.fc.0", dp + ["se_fc0"])
            rules += _linear_rule(sp + ".se.fc.2", dp + ["se_fc1"])
            rules += _conv_rule(sp + ".downsample.0", dp + ["downsample_conv"])
            rules += _bn_rule(sp + ".downsample.1", dp + ["downsample_bn"])
    # cross/self attention blocks
    for src_name, dst_name in (("crossA2V", "cross_a2v"),
                               ("crossV2A", "cross_v2a"),
                               ("selfAV", "self_av")):
        rules += mha_rules(f"{src_name}.self_attn", d + [dst_name, "self_attn"])
        for leaf in ("linear1", "linear2"):
            rules += _linear_rule(f"{src_name}.{leaf}", d + [dst_name, leaf])
        for norm in ("norm1", "norm2"):
            rules += [
                (f"{src_name}.{norm}.weight",
                 ("params", d + [dst_name, norm, "scale"]), t_id),
                (f"{src_name}.{norm}.bias",
                 ("params", d + [dst_name, norm, "bias"]), t_id),
            ]
    return rules


def mvit_rules(depth: int = 16, num_heads_out: int = 2,
               dst_prefix: List[str] = []):
    """PySlowFast MViT state_dict → egot2x MViT tree.

    Source names per HOI/models/lta/video_model_builder.py:627-1408
    (patch_embed.proj, blocks.{i}.{norm1,attn.{qkv,proj,pool_q,pool_k,
    pool_v,norm_q,norm_k,norm_v},norm2,mlp.fc1,mlp.fc2,proj}, cls_token,
    pos_embed, norm, head.projection). attn.qkv is the reference's FUSED
    projection (:954); the per-head depthwise pool convs (head_dim
    channels shared across heads, :985-1006) transform like conv3d.
    """
    d = dst_prefix
    rules = [
        ("cls_token", ("params", d + ["cls_token"]), t_id),
        ("pos_embed", ("params", d + ["pos_embed"]), t_id),
        ("norm.weight", ("params", d + ["norm", "scale"]), t_id),
        ("norm.bias", ("params", d + ["norm", "bias"]), t_id),
    ]
    rules += _conv_rule("patch_embed.proj", d + ["patch_embed", "proj"],
                        t_conv3d, bias=True)
    for i in range(depth):
        sp = f"blocks.{i}"
        dp = d + [f"blocks_{i}"]
        for norm in ("norm1", "norm2"):
            rules += [
                (f"{sp}.{norm}.weight", ("params", dp + [norm, "scale"]), t_id),
                (f"{sp}.{norm}.bias", ("params", dp + [norm, "bias"]), t_id),
            ]
        rules += _linear_rule(f"{sp}.attn.qkv", dp + ["attn", "qkv"])
        rules += _linear_rule(f"{sp}.attn.proj", dp + ["attn", "proj"])
        for pool in ("pool_q", "pool_k", "pool_v"):
            rules += _conv_rule(f"{sp}.attn.{pool}", dp + ["attn", pool],
                                t_conv3d)
        for pn in ("norm_q", "norm_k", "norm_v"):
            rules += [
                (f"{sp}.attn.{pn}.weight",
                 ("params", dp + ["attn", pn, "scale"]), t_id),
                (f"{sp}.attn.{pn}.bias",
                 ("params", dp + ["attn", pn, "bias"]), t_id),
            ]
        rules += _linear_rule(f"{sp}.mlp.fc1", dp + ["mlp_fc1"])
        rules += _linear_rule(f"{sp}.mlp.fc2", dp + ["mlp_fc2"])
        rules += _linear_rule(f"{sp}.proj", dp + ["proj"])
    for hi in range(num_heads_out):
        rules += _linear_rule(f"head.projection.{hi}",
                              d + [f"head_projection_{hi}"])
    rules += _linear_rule("head.projection", d + ["head_projection_0"])
    return rules


def torch_encoder_rules(src_prefix: str, dst_prefix: List[str],
                        num_layers: int):
    """torch ``nn.TransformerEncoder`` (layers.{i}.{self_attn, linear1,
    linear2, norm1, norm2}) → egot2x TransformerEncoder (layers_{i})."""
    rules = []
    for i in range(num_layers):
        sp = f"{src_prefix}.layers.{i}"
        dp = dst_prefix + [f"layers_{i}"]
        rules += mha_rules(sp + ".self_attn", dp + ["self_attn"])
        for leaf in ("linear1", "linear2"):
            rules += _linear_rule(f"{sp}.{leaf}", dp + [leaf])
        for norm in ("norm1", "norm2"):
            rules += [
                (f"{sp}.{norm}.weight", ("params", dp + [norm, "scale"]), t_id),
                (f"{sp}.{norm}.bias", ("params", dp + [norm, "bias"]), t_id),
            ]
    return rules


def torch_decoder_rules(src_prefix: str, dst_prefix: List[str],
                        num_layers: int):
    """torch ``nn.TransformerDecoder`` (layers.{i}.{self_attn,
    multihead_attn, linear1, linear2, norm1..3}) → egot2x
    TransformerDecoder (layers_{i})."""
    rules = []
    for i in range(num_layers):
        sp = f"{src_prefix}.layers.{i}"
        dp = dst_prefix + [f"layers_{i}"]
        rules += mha_rules(sp + ".self_attn", dp + ["self_attn"])
        rules += mha_rules(sp + ".multihead_attn", dp + ["multihead_attn"])
        for leaf in ("linear1", "linear2"):
            rules += _linear_rule(f"{sp}.{leaf}", dp + [leaf])
        for norm in ("norm1", "norm2", "norm3"):
            rules += [
                (f"{sp}.{norm}.weight", ("params", dp + [norm, "scale"]), t_id),
                (f"{sp}.{norm}.bias", ("params", dp + [norm, "bias"]), t_id),
            ]
    return rules


def ts_pnr_rules(num_layers: int = 1):
    """Full ``TaskFusionMFTransformer3TaskDropout`` (the ts_pnr/ts_oscc
    translator, HOI/models/pnr/video_model_transfer_3task.py:213-258)
    state_dict → egot2x tree: both frozen ResNet3D backbones, the frozen
    SlowFast, the four stream projections, the shared pre-PE/head
    LayerNorm (``ln`` IS ``linear_head.0`` — one module registered
    twice), the learned PE, and the torch encoder stack.

    The Stage-I head projections (Keyframe_localisation_head /
    State_detection_head) exist in reference checkpoints but are dead
    under ``middle=True`` and therefore absent from the flax tree — load
    through ``partial_match_load`` to prune them.
    """
    rules = []
    rules += resnet3d_rules("pnr_model", ["pnr_model", "trunk"])
    rules += _linear_rule("pnr_model.Keyframe_localisation_head.projection",
                          ["pnr_model", "head", "projection"])
    rules += resnet3d_rules("oscc_model", ["oscc_model", "trunk"])
    rules += _linear_rule("oscc_model.State_detection_head.projection",
                          ["oscc_model", "head", "projection"])
    rules += slowfast_rules("recognition_model", ["action_model"])
    for proj in ("proj1", "proj2", "proj3_slow", "proj3_fast"):
        rules += _linear_rule(proj, [proj])
    rules += [
        ("pe", ("params", ["core", "pe"]), t_id),
        ("ln.weight", ("params", ["core", "ln", "scale"]), t_id),
        ("ln.bias", ("params", ["core", "ln", "bias"]), t_id),
        # linear_head.0 is the SAME LayerNorm object as ``ln`` — torch
        # serializes shared modules under every registered name; both
        # map onto the one tied flax param.
        ("linear_head.0.weight", ("params", ["core", "ln", "scale"]), t_id),
        ("linear_head.0.bias", ("params", ["core", "ln", "bias"]), t_id),
    ]
    rules += torch_encoder_rules("transformer", ["core", "transformer"],
                                 num_layers)
    rules += _linear_rule("linear_head.1", ["head_fc"])
    return rules


def _lta_translator_common(num_layers: int, agg_layers: int,
                           num_actions: int):
    """Streams shared by the LTA-target translators
    (lta_models_lta_transfer.py): frozen AR SlowFast with live head,
    frozen LTA ForecastingEncoderDecoder, the (pe, ln, transformer)
    fusion core, and the Z-action MultiTaskHead decode."""
    rules = []
    rules += slowfast_rules("action_model", ["action_model"])
    rules += _linear_rule("action_model.head.projection",
                          ["action_head", "projection_0"])
    rules += slowfast_rules("lta_model.backbone",
                            ["lta_model", "backbone", "trunk"])
    rules += _linear_rule("lta_model.backbone.head.projection",
                          ["lta_model", "backbone", "head", "projection_0"])
    rules += torch_encoder_rules("lta_model.clip_aggregator.encoder",
                                 ["lta_model", "clip_aggregator", "encoder"],
                                 agg_layers)
    rules += [
        ("lta_model.clip_aggregator.encoder.norm.weight",
         ("params", ["lta_model", "clip_aggregator", "final_ln", "scale"]),
         t_id),
        ("lta_model.clip_aggregator.encoder.norm.bias",
         ("params", ["lta_model", "clip_aggregator", "final_ln", "bias"]),
         t_id),
        ("pe", ("params", ["core", "pe"]), t_id),
        ("ln.weight", ("params", ["core", "ln", "scale"]), t_id),
        ("ln.bias", ("params", ["core", "ln", "bias"]), t_id),
    ]
    rules += torch_encoder_rules("transformer", ["core", "transformer"],
                                 num_layers)
    for z in range(num_actions):
        rules += _linear_rule(f"head.projections.{z}",
                              ["decoder", f"head_{z}"])
    return rules


def egot2s_lta2task_rules(num_layers: int = 1, agg_layers: int = 6,
                          num_actions: int = 20):
    """Reference LTA-target ``TaskFusionMFTransformer2Task`` state_dict
    (HOI/models/lta/lta_models_lta_transfer.py:429-526) → egot2x
    ``TaskFusionMFTransformer2TaskLTA`` tree. ``proj_lta`` exists only
    when TRANSLATION_INPUT_FEATURES != 2048 (reference :438-440 uses
    Identity otherwise) — neither side constructs it at the published
    config."""
    return _lta_translator_common(num_layers, agg_layers, num_actions)


def egot2s_lta4task_rules(num_layers: int = 1, agg_layers: int = 6,
                          num_actions: int = 20):
    """Reference ``TaskFusionMFTransformerLTA4Task`` state_dict
    (HOI/models/lta/lta_models_lta_transfer.py:257-377) → egot2x
    ``TaskFusionMFTransformerLTA4Task`` tree: adds the frozen PNR/OSCC
    backbones and the three stream projections on top of the 2-task
    surface. The LTA decoder (build_decoder=True but dead under
    middle=True) prunes via ``partial_match_load``."""
    rules = _lta_translator_common(num_layers, agg_layers, num_actions)
    rules += resnet3d_rules("pnr_model", ["pnr_model", "trunk"])
    rules += _linear_rule("pnr_model.Keyframe_localisation_head.projection",
                          ["pnr_model", "head", "projection"])
    rules += resnet3d_rules("oscc_model", ["oscc_model", "trunk"])
    rules += _linear_rule("oscc_model.State_detection_head.projection",
                          ["oscc_model", "head", "projection"])
    for proj in ("proj_pnr", "proj_oscc", "proj_lta"):
        rules += _linear_rule(proj, [proj])
    return rules


def egot2g_2task_rules(num_layers: int = 3):
    """Reference ``TaskTranslationPromptTransformer2Task`` state_dict
    (HOI/models/multitask/video_model_builder_2task.py:51-166, the
    task12 EgoT2-g model) → egot2x TaskTranslationPromptTransformer2Task
    tree: both frozen ResNet3D backbones, the two 8192→D projections,
    and the prompt core (task_embed, shared encode-LN, vocab embedding,
    torch encoder+decoder stacks, vocab fc). The sinusoidal
    ``pos_embed.pe`` buffer has no parameters on either side."""
    rules = []
    rules += resnet3d_rules("pnr_model", ["pnr_model", "trunk"])
    rules += _linear_rule("pnr_model.Keyframe_localisation_head.projection",
                          ["pnr_model", "head", "projection"])
    rules += resnet3d_rules("oscc_model", ["oscc_model", "trunk"])
    rules += _linear_rule("oscc_model.State_detection_head.projection",
                          ["oscc_model", "head", "projection"])
    for proj in ("proj_pnr", "proj_oscc"):
        rules += _linear_rule(proj, [proj])
    rules += [
        ("task_embed", ("params", ["core", "task_embed"]), t_id),
        ("embedding.weight",
         ("params", ["core", "embedding", "embedding"]), t_id),
        ("ln.weight", ("params", ["core", "ln", "scale"]), t_id),
        ("ln.bias", ("params", ["core", "ln", "bias"]), t_id),
    ]
    rules += _linear_rule("fc", ["core", "fc"])
    rules += torch_encoder_rules("transformer_encoder",
                                 ["core", "transformer_encoder"], num_layers)
    rules += torch_decoder_rules("transformer_decoder",
                                 ["core", "transformer_decoder"], num_layers)
    return rules


def egot2g_action_rules(num_layers: int = 3, agg_layers: int = 6,
                        temporal: bool = True):
    """Reference ``TaskTranslationPromptTransformer[Temporal]ActionTask``
    state_dict (HOI/models/multitask/video_model_builder_action.py:21-215,
    the unify4taskaction EgoT2-g model) → egot2x
    TaskTranslationPromptTransformerActionTask tree: the frozen AR
    SlowFast trunk with its LIVE feature head (reference
    freeze_backbone_params never freezes ``head``), the frozen LTA
    ``ForecastingEncoderDecoder`` (SlowFast-with-head clip backbone +
    transformer clip aggregator incl. the encoder's final norm), the
    temporal-variant slow/fast/lta projections, the learned (1, 4, D)
    ``pe``, and the prompt core. The LTA ``decoder`` (MultiHeadDecoder)
    and the sinusoidal PE buffers exist in reference checkpoints but
    are dead under the prompt model — load via ``partial_match_load``
    to prune them."""
    rules = []
    rules += slowfast_rules("action_model", ["action_model"])
    rules += _linear_rule("action_model.head.projection",
                          ["action_head", "projection_0"])
    rules += slowfast_rules("lta_model.backbone", ["lta_backbone", "trunk"])
    rules += _linear_rule("lta_model.backbone.head.projection",
                          ["lta_backbone", "head", "projection_0"])
    rules += torch_encoder_rules("lta_model.clip_aggregator.encoder",
                                 ["lta_aggregator", "encoder"], agg_layers)
    rules += [
        # torch serializes TransformerEncoder(norm=LayerNorm) as
        # ``encoder.norm``; egot2x keeps it outside the stack
        ("lta_model.clip_aggregator.encoder.norm.weight",
         ("params", ["lta_aggregator", "final_ln", "scale"]), t_id),
        ("lta_model.clip_aggregator.encoder.norm.bias",
         ("params", ["lta_aggregator", "final_ln", "bias"]), t_id),
        ("pe", ("params", ["pe"]), t_id),
        ("task_embed", ("params", ["core", "task_embed"]), t_id),
        ("embedding.weight",
         ("params", ["core", "embedding", "embedding"]), t_id),
        ("ln.weight", ("params", ["core", "ln", "scale"]), t_id),
        ("ln.bias", ("params", ["core", "ln", "bias"]), t_id),
    ]
    rules += _linear_rule("fc", ["core", "fc"])
    rules += torch_encoder_rules("transformer_encoder",
                                 ["core", "transformer_encoder"], num_layers)
    rules += torch_decoder_rules("transformer_decoder",
                                 ["core", "transformer_decoder"], num_layers)
    if temporal:
        for proj in ("proj_action_slow", "proj_action_fast", "proj_lta"):
            rules += _linear_rule(proj, [proj])
    return rules


def egot2g_6task_rules(num_layers: int = 3, agg_layers: int = 6):
    """Reference ``TaskTranslationPromptTransformer6Task`` state_dict
    (HOI/models/multitask/video_model_builder.py:278-383, the unify6task
    EgoT2-g model) → egot2x TaskTranslationPromptTransformer6Task tree:
    both frozen ResNet3D PNR backbones, the frozen AR SlowFast with its
    LIVE head (freeze_backbone_params spares ``head``), the frozen LTA
    ForecastingEncoderDecoder (built with build_decoder=False — no
    decoder keys), the five stream projections, and the 4-task prompt
    core."""
    rules = []
    rules += resnet3d_rules("pnr_model", ["pnr_model", "trunk"])
    rules += _linear_rule("pnr_model.Keyframe_localisation_head.projection",
                          ["pnr_model", "head", "projection"])
    rules += resnet3d_rules("oscc_model", ["oscc_model", "trunk"])
    rules += _linear_rule("oscc_model.State_detection_head.projection",
                          ["oscc_model", "head", "projection"])
    rules += slowfast_rules("recognition_model", ["recognition_model"])
    rules += _linear_rule("recognition_model.head.projection",
                          ["recognition_head", "projection_0"])
    rules += slowfast_rules("lta_model.backbone", ["lta_backbone", "trunk"])
    rules += _linear_rule("lta_model.backbone.head.projection",
                          ["lta_backbone", "head", "projection_0"])
    rules += torch_encoder_rules("lta_model.clip_aggregator.encoder",
                                 ["lta_aggregator", "encoder"], agg_layers)
    rules += [
        ("lta_model.clip_aggregator.encoder.norm.weight",
         ("params", ["lta_aggregator", "final_ln", "scale"]), t_id),
        ("lta_model.clip_aggregator.encoder.norm.bias",
         ("params", ["lta_aggregator", "final_ln", "bias"]), t_id),
        ("task_embed", ("params", ["core", "task_embed"]), t_id),
        ("embedding.weight",
         ("params", ["core", "embedding", "embedding"]), t_id),
        ("ln.weight", ("params", ["core", "ln", "scale"]), t_id),
        ("ln.bias", ("params", ["core", "ln", "bias"]), t_id),
    ]
    for proj in ("proj_pnr", "proj_oscc", "proj_action_slow",
                 "proj_action_fast", "proj_lta"):
        rules += _linear_rule(proj, [proj])
    rules += _linear_rule("fc", ["core", "fc"])
    rules += torch_encoder_rules("transformer_encoder",
                                 ["core", "transformer_encoder"], num_layers)
    rules += torch_decoder_rules("transformer_decoder",
                                 ["core", "transformer_decoder"], num_layers)
    return rules


def egot2g_hhi_rules(num_layers: int = 3):
    """Reference HHI ``TaskPromptTransformer`` (single-stream baseline)
    and ``TaskTranslationPromptTransformer`` (3-stream EgoT2-g) share
    one state_dict surface (HHI/models/multitask/task_prompt_model.py:
    39-293) → egot2x tree of the same two models: frozen LAM/TTM
    resnet18 token extractors + full TalkNet, the three 256→D stream
    projections, and the prompt core (task_embed, shared encode-LN,
    vocab embedding, fc head, encoder + decoder stacks). Dead torch
    modules (LAM/TTM BiLSTMs, TTM audio encoder, sinusoidal PE buffers)
    prune via ``partial_match_load``."""
    rules = []
    rules += resnet18_rules("lam_model.base_model",
                            ["lam_model", "trunk", "base_model"])
    rules += resnet18_rules("ttm_model.video_encoder",
                            ["ttm_model", "trunk", "video_encoder"])
    rules += _prefix_src(talknet_rules(["asd_model"]), "asd_model")
    for s in ("lam", "ttm", "asd"):
        rules += _linear_rule(f"proj_{s}", [f"proj_{s}"])
    rules += [
        ("task_embed", ("params", ["core", "task_embed"]), t_id),
        ("embedding.weight",
         ("params", ["core", "embedding", "embedding"]), t_id),
        ("ln.weight", ("params", ["core", "ln", "scale"]), t_id),
        ("ln.bias", ("params", ["core", "ln", "bias"]), t_id),
    ]
    rules += _linear_rule("fc", ["core", "fc"])
    rules += torch_encoder_rules("transformer_encoder",
                                 ["core", "transformer_encoder"], num_layers)
    rules += torch_decoder_rules("transformer_decoder",
                                 ["core", "transformer_decoder"], num_layers)
    return rules


def _prefix_src(rules, prefix: str):
    """Re-root a rule family's torch source keys under ``prefix.``."""
    return [(f"{prefix}.{src}", dst, transform) for src, dst, transform in rules]


def egot2s_ttm_rules(n_tasks: int = 3, num_layers: int = 1):
    """Reference Stage-II TTM translator state_dict
    (HHI/models/ttm/model_taskspecific.py:155-245) → egot2x
    ``TaskFusionMFTransformer{2,3}Task`` tree — the published flagship
    ``egot2s_{2task,3task}_*.ckpt`` family (README.md:193; defaults match
    the released hidden 128 / 1-layer configs).

    The frozen backbones translate through their Stage-I rule families
    re-rooted under the translator attribute names. Torch keys for
    modules the flax tree never constructs under ``middle=True`` token
    extraction — the LAM/TTM BiLSTMs and the TTM ResNetSE audio
    encoder — fall to ``unused`` and are pruned by
    ``partial_match_load`` (mirroring the reference's own strict=False
    loads). The sinusoidal ``pos_embed.pe`` buffer has no parameters on
    either side. The SHARED encode-LN ``ln`` maps to core/ln; the head's
    LayerNorm is ``linear_head.0`` → head_ln (distinct tensors — the
    parity tie the round-2 fix established).
    """
    rules = []
    rules += resnet18_rules("lam_model.base_model",
                            ["lam_model", "trunk", "base_model"])
    rules += resnet18_rules("ttm_model.video_encoder",
                            ["ttm_model", "trunk", "video_encoder"])
    if n_tasks == 3:
        rules += _prefix_src(talknet_rules(["asd_model"]), "asd_model")
    streams = ["ttm", "lam"] + (["asd"] if n_tasks == 3 else [])
    for s in streams:
        rules += _linear_rule(f"proj_{s}", ["core", f"proj_{s}"])
    rules += [
        ("task_embed", ("params", ["core", "task_embed"]), t_id),
        ("ln.weight", ("params", ["core", "ln", "scale"]), t_id),
        ("ln.bias", ("params", ["core", "ln", "bias"]), t_id),
        ("linear_head.0.weight", ("params", ["head_ln", "scale"]), t_id),
        ("linear_head.0.bias", ("params", ["head_ln", "bias"]), t_id),
    ]
    rules += _linear_rule("linear_head.1", ["head_fc"])
    rules += torch_encoder_rules("transformer_encoder",
                                 ["core", "transformer_encoder"], num_layers)
    return rules


def egot2s_ttm_2task_rules(num_layers: int = 1):
    return egot2s_ttm_rules(2, num_layers)


def egot2s_asd3task_rules(num_layers: int = 3):
    """Reference ASD-target ``TaskFusionMFTransformer3Task`` state_dict
    (HHI/models/asd/model_taskspecific.py:110-160) → egot2x
    ``TaskFusionMFTransformer3TaskASD`` tree. Same surface as the TTM
    flagship except the unused ``linear_head`` (the frame-level
    translator returns features for the external lossAV head; the
    flax model builds no head) — its keys prune via
    ``partial_match_load``."""
    rules = egot2s_ttm_rules(3, num_layers)
    head_keys = {"linear_head.0.weight", "linear_head.0.bias",
                 "linear_head.1.weight", "linear_head.1.bias"}
    return [r for r in rules if r[0] not in head_keys]


# ---- caffe2 / partial-match loaders -------------------------------------

_C2_PAIRS = [
    # Caffe2 → PySlowFast naming (reference
    # HOI/utils/lta/c2_model_loading.py:19-105); nonlocal rules omitted
    # (EgoT2 configs never enable nonlocal blocks).
    (r"^t_pool1_subsample_bn_(.*)", r"s1_fuse.bn.\1"),
    (r"^t_pool1_subsample_(.*)", r"s1_fuse.conv_f2s.\1"),
    (r"^t_res([0-9]+)_([0-9]+)_branch2c_bn_subsample_bn_(.*)", r"s\1_fuse.bn.\3"),
    (r"^t_res([0-9]+)_([0-9]+)_branch2c_bn_subsample_(.*)", r"s\1_fuse.conv_f2s.\3"),
    (r"^res([0-9]+)_([0-9]+)_branch([0-9]+)([a-z])_(.*)",
     r"s\1.pathway0_res\2.branch\3.\4_\5"),
    (r"^res_conv1_bn_(.*)", r"s1.pathway0_stem.bn.\1"),
    (r"^conv1_(.*)", r"s1.pathway0_stem.conv.\1"),
    (r"^res([0-9]+)_([0-9]+)_branch([0-9]+)_(.*)",
     r"s\1.pathway0_res\2.branch\3_\4"),
    (r"^res_conv1_(.*)", r"s1.pathway0_stem.conv.\1"),
    (r"^t_res([0-9]+)_([0-9]+)_branch([0-9]+)([a-z])_(.*)",
     r"s\1.pathway1_res\2.branch\3.\4_\5"),
    (r"^t_res_conv1_bn_(.*)", r"s1.pathway1_stem.bn.\1"),
    (r"^t_conv1_(.*)", r"s1.pathway1_stem.conv.\1"),
    (r"^t_res([0-9]+)_([0-9]+)_branch([0-9]+)_(.*)",
     r"s\1.pathway1_res\2.branch\3_\4"),
    (r"^t_res_conv1_(.*)", r"s1.pathway1_stem.conv.\1"),
    (r"pred_(.*)", r"head.projection.\1"),
    (r"(.*)bn.b\Z", r"\1bn.bias"),
    (r"(.*)bn.s\Z", r"\1bn.weight"),
    (r"(.*)bn.rm\Z", r"\1bn.running_mean"),
    (r"(.*)bn.riv\Z", r"\1bn.running_var"),
    (r"(.*)[\._]b\Z", r"\1.bias"),
    (r"(.*)[\._]w\Z", r"\1.weight"),
]


def convert_caffe2_name(name: str) -> str:
    """Caffe2 blob name → PySlowFast parameter name (reference
    get_name_convert_func)."""
    for src, dst in _C2_PAIRS:
        name = re.sub(src, dst, name)
    return name


def load_caffe2_pickle(path: str) -> Dict[str, np.ndarray]:
    """Read a caffe2 pickle checkpoint (reference run_lta.py:101-115)
    and return a PySlowFast-named state dict ready for the
    resnet3d/slowfast rule maps."""
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    blobs = data.get("blobs", data)
    out = {}
    for k, v in blobs.items():
        if "momentum" in k or not hasattr(v, "shape"):
            continue
        out[convert_caffe2_name(k)] = np.asarray(v)
    return out


def partial_match_load(state: Dict[str, np.ndarray], rules,
                       template_paths) -> Dict[str, Any]:
    """MViT-style partial-match loading (reference run_lta.py:117-170):
    apply the rules, then keep only leaves whose destination path exists
    in ``template_paths`` (set of keystr paths from a model init)."""
    translated = apply_rules(state, rules)
    import jax

    def prune(tree, prefix):
        out = {}
        for k, v in tree.items():
            p = prefix + "/" + k
            if isinstance(v, dict):
                sub = prune(v, p)
                if sub:
                    out[k] = sub
            elif p in template_paths:
                out[k] = v
        return out

    translated["params"] = prune(translated["params"], "params")
    translated["batch_stats"] = prune(translated["batch_stats"], "batch_stats")
    return translated


def tree_paths(variables: Dict[str, Any]) -> set:
    """keystr path set ('collection/a/b') for partial_match_load."""
    import jax

    out = set()
    for coll, tree in variables.items():
        for p, _ in jax.tree_util.tree_leaves_with_path(tree):
            out.add(coll + jax.tree_util.keystr(p).replace("['", "/").replace("']", ""))
    return out


# ---- entry point --------------------------------------------------------

FAMILIES: Dict[str, Callable[[], list]] = {
    "lam_baseline": lam_baseline_rules,
    "ttm_baseline": ttm_baseline_rules,
    "asd_talknet": talknet_rules,
    "mvit": mvit_rules,
    "pnr_keyframe": pnr_keyframe_rules,
    "oscc": oscc_rules,
    "ts_pnr": ts_pnr_rules,
    "egot2g_2task": egot2g_2task_rules,
    "egot2g_action": egot2g_action_rules,
    "egot2g_hhi": egot2g_hhi_rules,
    "egot2g_6task": egot2g_6task_rules,
    "egot2s_ttm_2task": egot2s_ttm_2task_rules,
    "egot2s_ttm_3task": egot2s_ttm_rules,
    "egot2s_asd_3task": egot2s_asd3task_rules,
    "egot2s_lta_2task": egot2s_lta2task_rules,
    "egot2s_lta_4task": egot2s_lta4task_rules,
}


def _stack_depth(state: Dict[str, np.ndarray], prefix: str) -> int:
    """Number of ``{prefix}.layers.N.*`` layers present in a state_dict."""
    pat = re.compile(re.escape(prefix) + r"\.layers\.(\d+)\.")
    idx = [int(m.group(1)) for k in state if (m := pat.match(k))]
    return max(idx) + 1 if idx else 0


def derive_family_kwargs(state: Dict[str, np.ndarray], family: str) -> Dict[str, Any]:
    """Derive a rule family's structural kwargs from the checkpoint
    itself: torch serializes every encoder/decoder layer, so the layer
    count is readable from the key space — a non-default
    TRANSLATION_LAYERS checkpoint must not silently translate only the
    default count (round-3 advisor finding)."""
    import inspect

    accepted = inspect.signature(FAMILIES[family]).parameters
    kwargs: Dict[str, Any] = {}
    if "num_layers" in accepted:
        n = (_stack_depth(state, "transformer_encoder")
             or _stack_depth(state, "transformer"))
        if n:
            kwargs["num_layers"] = n
    if "agg_layers" in accepted:
        n = _stack_depth(state, "lta_model.clip_aggregator.encoder")
        if n:
            kwargs["agg_layers"] = n
    if "num_actions" in accepted:
        pat = re.compile(r"head\.projections\.(\d+)\.weight$")
        idx = [int(m.group(1)) for k in state if (m := pat.match(k))]
        if idx:
            kwargs["num_actions"] = max(idx) + 1
    if "temporal" in accepted:
        kwargs["temporal"] = any(k.startswith("proj_action_slow.")
                                 for k in state)
    return kwargs


def import_torch_checkpoint(path: str, family: str) -> Dict[str, Any]:
    """Translate a reference checkpoint into {params, batch_stats, unused}."""
    state = strip_prefix(load_torch_state_dict(path))
    rules = FAMILIES[family](**derive_family_kwargs(state, family))
    out = apply_rules(state, rules)
    # A translated-stack layer left unused means the rules and the
    # checkpoint disagree structurally — fail loudly, never silently
    # drop trained layers.
    stray = [k for k in out["unused"] if ".layers." in k and any(
        s in k for s in ("transformer_encoder", "transformer_decoder",
                         "clip_aggregator"))]
    if stray:
        raise ValueError(
            f"{family}: {len(stray)} encoder/decoder layer tensors were "
            f"not translated (first: {stray[0]}) — structural mismatch "
            "between rules and checkpoint")
    return out
