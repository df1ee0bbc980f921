"""Importer for released PyTorch ADM checkpoints -> flax param pytrees.

The reference ships .pt state_dicts (README.md:13-27 model zoo). This module
maps them onto our NHWC flax parameter tree (a hard parity requirement,
SURVEY.md §5.4). The mapping is purely name-driven: our module names were
chosen so every flax path determines its torch key:

  flax                                  torch
  ----------------------------------------------------------------------
  time_embed_0/dense/kernel             time_embed.0.weight (transposed)
  label_emb/embedding                   label_emb.weight
  label_emb_0/dense/kernel              label_emb.0.weight (fork MLP)
  input_blocks_3_0/in_norm/scale        input_blocks.3.0.in_layers.0.weight
  input_blocks_3_0/in_conv/conv/kernel  input_blocks.3.0.in_layers.2.weight
  ...emb_proj/dense/*                   ...emb_layers.1.*
  ...out_norm, out_conv, skip           ...out_layers.0/.3, skip_connection
  ...norm, qkv, proj_out (attention)    same names
  input_blocks_0_0/conv/*  (stem)       input_blocks.0.0.*
  ..._i_j/op/conv/* (Downsample)        ....op.*
  ..._i_j/conv/conv/* (Upsample)        ....conv.*
  out_norm, out_conv                    out.0, out.2 (UNet)
  bias_feat                             bias_feat (fork SR models)

Tensor layout transforms:
  conv2d  (O, I, kh, kw) -> (kh, kw, I, O)
  conv1d  (O, I, 1)      -> (I, O)   (we implement 1x1 conv1d as Dense)
  linear  (O, I)         -> (I, O)
  groupnorm weight/bias  -> scale/bias (unchanged)
  embedding              -> unchanged
  positional_embedding (C, T+1) -> (T+1, C)

Works in both directions (export_to_torch) so native checkpoints can be
consumed by the reference tooling.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import jax
import numpy as np


_SUBLAYER_MAP = {
    "in_norm": "in_layers.0",
    "in_conv": "in_layers.2",
    "emb_proj": "emb_layers.1",
    "out_norm": "out_layers.0",
    "out_conv": "out_layers.3",
    "skip": "skip_connection",
    "norm": "norm",
    "qkv": "qkv",
    "proj_out": "proj_out",
    "op": "op",
    "conv": "conv",
}

_BLOCK_RE = re.compile(r"^(input_blocks|output_blocks)_(\d+)_(\d+)$")
_MIDDLE_RE = re.compile(r"^middle_block_(\d+)$")


def _head_map(model: str, pool: str | None) -> Mapping[str, str]:
    """Output-head name map; differs per model/pool (unet.py:613-617, 825-854)."""
    if model == "unet":
        return {"out_norm": "out.0", "out_conv": "out.2"}
    assert model == "encoder"
    if pool == "adaptive":
        return {"out_norm": "out.0", "out_conv": "out.3"}
    if pool == "attention":
        return {"out_norm": "out.0", "out_pool": "out.2"}
    if pool == "spatial":
        return {"out_0": "out.0", "out_3": "out.2"}
    if pool == "spatial_v2":
        return {"out_0": "out.0", "out_norm": "out.1", "out_3": "out.3"}
    raise ValueError(f"unknown pool {pool}")


def flax_path_to_torch_key(path: tuple[str, ...], *, model: str = "unet", pool: str | None = None) -> str:
    """Translate one flax param path to the reference torch state_dict key."""
    parts = list(path)
    top = parts[0]

    # strip Conv/Dense wrapper level ("conv"/"dense" just before the leaf)
    if len(parts) >= 2 and parts[-2] in ("conv", "dense"):
        parts = parts[:-2] + [parts[-1]]

    leaf = parts[-1]
    leaf_t = {"kernel": "weight", "scale": "weight", "bias": "bias", "embedding": "weight"}.get(leaf, leaf)

    if top == "bias_feat":
        return "bias_feat"
    if top in ("time_embed_0", "time_embed_2"):
        return f"time_embed.{top[-1]}.{leaf_t}"
    if top == "label_emb":
        return f"label_emb.{leaf_t}"
    if top in ("label_emb_0", "label_emb_2"):
        return f"label_emb.{top[-1]}.{leaf_t}"

    hm = _head_map(model, pool)
    if top in hm:
        mid = parts[1:-1]
        if mid:  # e.g. out_pool/qkv_proj
            return f"{hm[top]}.{'.'.join(mid)}.{leaf_t}"
        return f"{hm[top]}.{leaf_t}"

    m = _BLOCK_RE.match(top) or _MIDDLE_RE.match(top)
    if m is None:
        raise KeyError(f"unmapped flax path: {path}")
    if m.re is _MIDDLE_RE:
        prefix = f"middle_block.{m.group(1)}"
    else:
        prefix = f"{m.group(1)}.{m.group(2)}.{m.group(3)}"

    if len(parts) == 2:
        # stem conv: input_blocks_0_0/{kernel,bias}
        return f"{prefix}.{leaf_t}"
    sub = parts[1]
    if sub not in _SUBLAYER_MAP:
        raise KeyError(f"unmapped sublayer {sub} in {path}")
    return f"{prefix}.{_SUBLAYER_MAP[sub]}.{leaf_t}"


def _to_flax_tensor(torch_tensor, flax_shape, path) -> np.ndarray:
    """Apply the layout transform implied by source/target ranks."""
    arr = np.asarray(torch_tensor.detach().cpu().numpy() if hasattr(torch_tensor, "detach") else torch_tensor)
    leaf = path[-1]
    if leaf == "positional_embedding":
        arr = arr.T
    elif arr.ndim == 4 and len(flax_shape) == 4:
        arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    elif arr.ndim == 3 and len(flax_shape) == 2:
        arr = arr[:, :, 0].T  # conv1d (O, I, 1) -> dense (I, O)
    elif arr.ndim == 2 and len(flax_shape) == 2 and leaf == "kernel":
        arr = arr.T  # linear (O, I) -> (I, O)
    # 1-D (biases, norm params, bias_feat) and embeddings: unchanged
    if tuple(arr.shape) != tuple(flax_shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: torch {arr.shape} vs flax {flax_shape}")
    return arr


# flax Dense layers that correspond to conv_nd(1, ...) in the reference and
# must export as rank-3 (O, I, 1) conv1d weights
_CONV1D_NAMES = ("qkv", "proj_out", "qkv_proj", "c_proj")


def _from_flax_tensor(arr: np.ndarray, path, torch_shape=None) -> np.ndarray:
    leaf = path[-1]
    arr = np.asarray(arr)
    if leaf == "positional_embedding":
        return arr.T
    if arr.ndim == 4:
        return arr.transpose(3, 2, 0, 1)
    if arr.ndim == 2 and leaf == "kernel":
        is_conv1d = (torch_shape is not None and len(torch_shape) == 3) or (
            torch_shape is None and any(p in _CONV1D_NAMES for p in path)
        )
        if is_conv1d:
            return arr.T[:, :, None]
        return arr.T
    return arr


def _iter_params(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for keypath, value in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        yield path, value


def import_torch_state_dict(
    state_dict: Mapping[str, Any],
    params_template,
    *,
    model: str = "unet",
    pool: str | None = None,
    strict: bool = True,
    missing_ok: bool = False,
    widen_stem_to: int | None = None,
):
    """Build a flax params pytree from a torch state_dict.

    `params_template` supplies the tree structure and target shapes (e.g. from
    `model.init`). With strict=True every torch tensor must be consumed and
    every flax leaf filled (the reference's strict load_state_dict semantics).
    With missing_ok=True, flax leaves absent from the checkpoint keep their
    template values (load_state_dict(strict=False) semantics, used by the
    SRImageModel_Feat_cont warm start). `widen_stem_to` additionally widens a
    narrower stem-conv kernel's input channels with zeros
    (unet_other.py:121-136).
    """
    used = set()
    out_flat = {}
    for path, value in _iter_params(params_template):
        tkey = flax_path_to_torch_key(path, model=model, pool=pool)
        if tkey not in state_dict:
            if missing_ok:
                out_flat[path] = np.asarray(value, dtype=np.float32)
                continue
            raise KeyError(f"torch checkpoint missing {tkey} (for flax {'/'.join(path)})")
        src = state_dict[tkey]
        if (
            widen_stem_to is not None
            and path[0] == "input_blocks_0_0"
            and path[-1] == "kernel"
            and src.shape[1] < widen_stem_to
        ):
            narrow = _to_flax_tensor(src, (value.shape[0], value.shape[1], src.shape[1], value.shape[3]), path)
            widened = np.zeros(value.shape, dtype=np.float32)
            widened[:, :, : src.shape[1], :] = narrow
            out_flat[path] = widened
            used.add(tkey)
            continue
        out_flat[path] = _to_flax_tensor(src, value.shape, path).astype(np.float32)
        used.add(tkey)
    if strict:
        unused = set(state_dict.keys()) - used
        if unused:
            raise KeyError(f"torch keys not consumed: {sorted(unused)[:10]} (+{max(0, len(unused)-10)} more)")

    # rebuild the nested dict
    nested: dict = {}
    for path, arr in out_flat.items():
        d = nested
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = arr
    return nested


def export_to_torch(params, *, model: str = "unet", pool: str | None = None, reference_sd=None):
    """Flax params -> torch-style state_dict of numpy arrays (for the reference tooling)."""
    out = {}
    for path, value in _iter_params(params):
        tkey = flax_path_to_torch_key(path, model=model, pool=pool)
        tshape = None
        if reference_sd is not None and tkey in reference_sd:
            tshape = tuple(reference_sd[tkey].shape)
        out[tkey] = _from_flax_tensor(np.asarray(value), path, tshape)
    return out


def load_pt_checkpoint(path: str, params_template, *, model: str = "unet", pool: str | None = None):
    """Load a released .pt checkpoint file onto a flax param template."""
    import torch

    from . import bf_io

    with bf_io.open_file(path, "rb") as f:
        sd = torch.load(f, map_location="cpu", weights_only=True)
    return import_torch_state_dict(sd, params_template, model=model, pool=pool)
