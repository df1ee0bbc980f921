"""JAX/flax-style port of the frozen FID InceptionV3 graph.

The reference evaluator downloads the 2015 ``classify_image_graph_def.pb``
TF1 graph and reads two tensors from it: ``pool_3:0`` (2048-d pooled
features, for FID/IS/P&R) and ``mixed_6/conv:0`` first 7 channels (spatial
features, for sFID) — /root/reference/evaluations/evaluator.py:20-24,586-600.
This module reimplements that network as pure JAX functions over a flat
params dict, with a one-time converter from the .pb, so the evaluator needs
neither TensorFlow nor network access at eval time:

    python evaluations/inception_flax.py convert classify_image_graph_def.pb \
        evaluations/inception_v3_fid.npz

Architecture notes (the 2015 graph, not tf.keras's InceptionV3):
  - every conv unit is Conv(no bias) -> BatchNorm(frozen) -> ReLU; the
    converter folds the BN into a per-channel scale/shift and then into the
    conv weights + bias, so the runtime graph is just conv+bias+relu;
  - avg pools divide by the number of in-bounds window elements (TF AvgPool
    semantics == count_include_pad=False);
  - mixed_10's pool branch uses MAX pool while mixed_9's uses AVG (a quirk of
    this specific frozen graph, preserved by every faithful FID port);
  - the graph's own preprocessing applies: legacy bilinear resize to 299x299
    (align_corners=False, half_pixel_centers=False) then (x-128)/128;
  - the IS softmax is pool_3 @ W (softmax/logits/MatMul's weight, no bias),
    matching the reference's _create_softmax_graph (evaluator.py:604-617).

Param names mirror the TF scope prefixes (``mixed_4/tower/conv_1`` ...) so
converted weights are self-describing and mismatches are loud.
"""

from __future__ import annotations

import os
import sys
from functools import partial

import numpy as np

# --------------------------------------------------------------------------
# architecture table
# --------------------------------------------------------------------------

# conv units: name -> (kh, kw, stride, padding, out_channels)
V = "VALID"
S = "SAME"

STEM = [
    ("conv", 3, 3, 2, V, 32),
    ("conv_1", 3, 3, 1, V, 32),
    ("conv_2", 3, 3, 1, S, 64),
    # maxpool 3x3/2 V
    ("conv_3", 1, 1, 1, V, 80),
    ("conv_4", 3, 3, 1, V, 192),
    # maxpool 3x3/2 V
]


def _inception_a(name: str, pool_proj: int):
    """35x35 block (mixed, mixed_1, mixed_2)."""
    return {
        "branch0": [(f"{name}/conv", 1, 1, 1, S, 64)],
        "branch5x5": [
            (f"{name}/tower/conv", 1, 1, 1, S, 48),
            (f"{name}/tower/conv_1", 5, 5, 1, S, 64),
        ],
        "branch3x3dbl": [
            (f"{name}/tower_1/conv", 1, 1, 1, S, 64),
            (f"{name}/tower_1/conv_1", 3, 3, 1, S, 96),
            (f"{name}/tower_1/conv_2", 3, 3, 1, S, 96),
        ],
        "branch_pool": [(f"{name}/tower_2/conv", 1, 1, 1, S, pool_proj)],
    }


def _inception_c(name: str, c7: int):
    """17x17 block (mixed_4..mixed_7)."""
    return {
        "branch0": [(f"{name}/conv", 1, 1, 1, S, 192)],
        "branch7x7": [
            (f"{name}/tower/conv", 1, 1, 1, S, c7),
            (f"{name}/tower/conv_1", 1, 7, 1, S, c7),
            (f"{name}/tower/conv_2", 7, 1, 1, S, 192),
        ],
        "branch7x7dbl": [
            (f"{name}/tower_1/conv", 1, 1, 1, S, c7),
            (f"{name}/tower_1/conv_1", 7, 1, 1, S, c7),
            (f"{name}/tower_1/conv_2", 1, 7, 1, S, c7),
            (f"{name}/tower_1/conv_3", 7, 1, 1, S, c7),
            (f"{name}/tower_1/conv_4", 1, 7, 1, S, 192),
        ],
        "branch_pool": [(f"{name}/tower_2/conv", 1, 1, 1, S, 192)],
    }


def _expected_conv_units():
    """name -> (kh, kw, stride, padding, out_ch) for every conv in the net."""
    units = {}

    def add(specs):
        for (n, kh, kw, s, p, c) in specs:
            units[n] = (kh, kw, s, p, c)

    add(STEM)
    for name, proj in (("mixed", 32), ("mixed_1", 64), ("mixed_2", 64)):
        for branch in _inception_a(name, proj).values():
            add(branch)
    # mixed_3 (reduction to 17x17)
    add([
        ("mixed_3/conv", 3, 3, 2, V, 384),
        ("mixed_3/tower/conv", 1, 1, 1, S, 64),
        ("mixed_3/tower/conv_1", 3, 3, 1, S, 96),
        ("mixed_3/tower/conv_2", 3, 3, 2, V, 96),
    ])
    for name, c7 in (("mixed_4", 128), ("mixed_5", 160), ("mixed_6", 160), ("mixed_7", 192)):
        for branch in _inception_c(name, c7).values():
            add(branch)
    # mixed_8 (reduction to 8x8)
    add([
        ("mixed_8/tower/conv", 1, 1, 1, S, 192),
        ("mixed_8/tower/conv_1", 3, 3, 2, V, 320),
        ("mixed_8/tower_1/conv", 1, 1, 1, S, 192),
        ("mixed_8/tower_1/conv_1", 1, 7, 1, S, 192),
        ("mixed_8/tower_1/conv_2", 7, 1, 1, S, 192),
        ("mixed_8/tower_1/conv_3", 3, 3, 2, V, 192),
    ])
    # mixed_9 / mixed_10 (8x8 blocks)
    for name in ("mixed_9", "mixed_10"):
        add([
            (f"{name}/conv", 1, 1, 1, S, 320),
            (f"{name}/tower/conv", 1, 1, 1, S, 384),
            (f"{name}/tower/mixed/conv", 1, 3, 1, S, 384),
            (f"{name}/tower/mixed/conv_1", 3, 1, 1, S, 384),
            (f"{name}/tower_1/conv", 1, 1, 1, S, 448),
            (f"{name}/tower_1/conv_1", 3, 3, 1, S, 384),
            (f"{name}/tower_1/mixed/conv", 1, 3, 1, S, 384),
            (f"{name}/tower_1/mixed/conv_1", 3, 1, 1, S, 384),
            (f"{name}/tower_2/conv", 1, 1, 1, S, 192),
        ])
    return units


# --------------------------------------------------------------------------
# forward pass (pure jax; params = {name: {"w": HWIO, "b": [C]}, "softmax_w": ...})
# --------------------------------------------------------------------------


def legacy_resize_bilinear(x, out_h: int, out_w: int):
    """TF1 ResizeBilinear (align_corners=False, half_pixel_centers=False).

    src = dst * (in/out) — NOT the half-pixel-centers convention used by
    jax.image.resize, so it is implemented from scratch with static gathers.
    """
    import jax.numpy as jnp

    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x

    def axis_weights(in_size, out_size):
        scale = in_size / out_size
        src = np.arange(out_size, dtype=np.float64) * scale
        lo = np.floor(src).astype(np.int64)
        lo = np.clip(lo, 0, in_size - 1)
        hi = np.minimum(lo + 1, in_size - 1)
        frac = (src - lo).astype(np.float32)
        return lo, hi, frac

    ylo, yhi, yfrac = axis_weights(h, out_h)
    xlo, xhi, xfrac = axis_weights(w, out_w)
    yfrac = jnp.asarray(yfrac)[None, :, None, None]
    xfrac = jnp.asarray(xfrac)[None, None, :, None]

    top = x[:, ylo, :, :]
    bot = x[:, yhi, :, :]
    rows = top * (1.0 - yfrac) + bot * yfrac
    left = rows[:, :, xlo, :]
    right = rows[:, :, xhi, :]
    return left * (1.0 - xfrac) + right * xfrac


def _conv(params, name, x, spec):
    import jax
    import jax.numpy as jnp

    kh, kw, stride, padding, out_ch = spec
    p = params[name]
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["w"]),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + jnp.asarray(p["b"]))


def _max_pool(x, k=3, s=2, padding=V):
    import jax
    import jax.numpy as jnp

    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), padding
    )


def _avg_pool(x, k=3, s=1, padding=S):
    """TF AvgPool: divide by the count of in-bounds elements."""
    import jax
    import jax.numpy as jnp

    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, s, s, 1), padding
    )
    counts = jax.lax.reduce_window(
        jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None],
        0.0, jax.lax.add, (1, k, k, 1), (1, s, s, 1), padding,
    )
    return sums / counts


def _run_branches(params, units, x, branches, pool):
    """Apply each branch's conv chain, plus the pool branch, and concat."""
    import jax.numpy as jnp

    outs = []
    for chain in branches:
        h = x
        for spec_name in chain:
            h = _conv(params, spec_name, h, units[spec_name])
        outs.append(h)
    if pool is not None:
        kind, proj = pool[:2]
        stride, padding = (pool[2], pool[3]) if len(pool) > 2 else (1, S)
        pooled = (
            _max_pool(x, 3, stride, padding)
            if kind == "max"
            else _avg_pool(x, 3, stride, padding)
        )
        if proj is not None:
            pooled = _conv(params, proj, pooled, units[proj])
        outs.append(pooled)
    return jnp.concatenate(outs, axis=-1)


def inception_features(params, x_0_255, *, spatial_pre_activation=False):
    """[B,H,W,3] float in [0,255] -> (pool_3 [B,2048], spatial [B,17,17,7]).

    Mirrors the frozen graph from ExpandDims:0 onward: legacy bilinear resize
    to 299, (x-128)/128, the full v3 trunk, 8x8 avg pool. The spatial tensor
    is mixed_6's branch0 1x1-conv output (post-BN+ReLU, i.e. the tensor named
    ``mixed_6/conv:0``), first 7 channels. spatial_pre_activation is a STATIC
    python bool (pop it from load_params' dict before jitting).
    """
    units = _expected_conv_units()

    x = legacy_resize_bilinear(x_0_255, 299, 299)
    x = (x - 128.0) / 128.0

    # stem
    x = _conv(params, "conv", x, units["conv"])
    x = _conv(params, "conv_1", x, units["conv_1"])
    x = _conv(params, "conv_2", x, units["conv_2"])
    x = _max_pool(x)
    x = _conv(params, "conv_3", x, units["conv_3"])
    x = _conv(params, "conv_4", x, units["conv_4"])
    x = _max_pool(x)

    # 35x35
    for name in ("mixed", "mixed_1", "mixed_2"):
        x = _run_branches(
            params, units, x,
            branches=[
                [f"{name}/conv"],
                [f"{name}/tower/conv", f"{name}/tower/conv_1"],
                [f"{name}/tower_1/conv", f"{name}/tower_1/conv_1", f"{name}/tower_1/conv_2"],
            ],
            pool=("avg", f"{name}/tower_2/conv"),
        )

    # reduction to 17x17
    x = _run_branches(
        params, units, x,
        branches=[
            ["mixed_3/conv"],
            ["mixed_3/tower/conv", "mixed_3/tower/conv_1", "mixed_3/tower/conv_2"],
        ],
        pool=("max", None, 2, V),
    )

    # 17x17
    spatial = None
    for name in ("mixed_4", "mixed_5", "mixed_6", "mixed_7"):
        if name == "mixed_6":
            import jax
            import jax.numpy as jnp

            spec = units["mixed_6/conv"]
            p = params["mixed_6/conv"]
            folded = jax.lax.conv_general_dilated(
                x, jnp.asarray(p["w"]), (1, 1), S,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            post = jax.nn.relu(folded + jnp.asarray(p["b"]))
            if spatial_pre_activation:
                # `p["w"]` has the BN scale folded in (converter), so the
                # folded conv output is the reference's raw mixed_6/conv:0
                # scaled per-channel by the BN factor — the UNFOLDED weight
                # is stored separately for this case (sFID parity).
                p_raw = params.get("mixed_6/conv_raw")
                if p_raw is None:
                    raise ValueError(
                        "spatial_pre_activation=True needs the unfolded "
                        "'mixed_6/conv_raw' weights in the params npz; "
                        "re-run the pb->npz converter"
                    )
                raw = jax.lax.conv_general_dilated(
                    x, jnp.asarray(p_raw["w"]), (1, 1), S,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                spatial = raw[..., :7]
            else:
                spatial = post[..., :7]
            branch0 = post
        else:
            branch0 = _conv(params, f"{name}/conv", x, units[f"{name}/conv"])
        rest = _run_branches(
            params, units, x,
            branches=[
                [f"{name}/tower/conv", f"{name}/tower/conv_1", f"{name}/tower/conv_2"],
                [f"{name}/tower_1/conv", f"{name}/tower_1/conv_1",
                 f"{name}/tower_1/conv_2", f"{name}/tower_1/conv_3",
                 f"{name}/tower_1/conv_4"],
            ],
            pool=("avg", f"{name}/tower_2/conv"),
        )
        import jax.numpy as jnp

        x = jnp.concatenate([branch0, rest], axis=-1)

    # reduction to 8x8
    x = _run_branches(
        params, units, x,
        branches=[
            ["mixed_8/tower/conv", "mixed_8/tower/conv_1"],
            ["mixed_8/tower_1/conv", "mixed_8/tower_1/conv_1",
             "mixed_8/tower_1/conv_2", "mixed_8/tower_1/conv_3"],
        ],
        pool=("max", None, 2, V),
    )

    # 8x8 (mixed_9: avg pool branch; mixed_10: MAX pool branch — graph quirk)
    import jax.numpy as jnp

    for name, pool_kind in (("mixed_9", "avg"), ("mixed_10", "max")):
        b0 = _conv(params, f"{name}/conv", x, units[f"{name}/conv"])
        t = _conv(params, f"{name}/tower/conv", x, units[f"{name}/tower/conv"])
        t = jnp.concatenate([
            _conv(params, f"{name}/tower/mixed/conv", t, units[f"{name}/tower/mixed/conv"]),
            _conv(params, f"{name}/tower/mixed/conv_1", t, units[f"{name}/tower/mixed/conv_1"]),
        ], axis=-1)
        t1 = _conv(params, f"{name}/tower_1/conv", x, units[f"{name}/tower_1/conv"])
        t1 = _conv(params, f"{name}/tower_1/conv_1", t1, units[f"{name}/tower_1/conv_1"])
        t1 = jnp.concatenate([
            _conv(params, f"{name}/tower_1/mixed/conv", t1, units[f"{name}/tower_1/mixed/conv"]),
            _conv(params, f"{name}/tower_1/mixed/conv_1", t1, units[f"{name}/tower_1/mixed/conv_1"]),
        ], axis=-1)
        pooled = _max_pool(x, 3, 1, S) if pool_kind == "max" else _avg_pool(x, 3, 1, S)
        pooled = _conv(params, f"{name}/tower_2/conv", pooled, units[f"{name}/tower_2/conv"])
        x = jnp.concatenate([b0, t, t1, pooled], axis=-1)

    pool3 = jnp.mean(x, axis=(1, 2))  # 8x8 avg pool, squeezed
    return pool3, spatial


def inception_softmax(params, pool3):
    """IS predictions: softmax(pool_3 @ W), no bias (evaluator.py:604-617)."""
    import jax
    import jax.numpy as jnp

    return jax.nn.softmax(pool3 @ jnp.asarray(params["softmax_w"]))


# --------------------------------------------------------------------------
# converter: frozen .pb -> folded params npz
# --------------------------------------------------------------------------


def convert_pb(pb_path: str, out_path: str) -> dict:
    """One-time conversion of classify_image_graph_def.pb to a params npz.

    Walks the GraphDef structurally: for each BatchNorm-type node, its inputs
    are (conv_out, mean, variance, beta, gamma); the conv's weight const and
    the BN stats are folded into (w', b') with
        s = gamma / sqrt(var + eps);  w' = w * s;  b' = beta - mean * s.
    Keyed by the conv's TF scope prefix so mismatches with the architecture
    table above fail loudly rather than silently misloading.
    """
    import tensorflow.compat.v1 as tf

    with open(pb_path, "rb") as f:
        gd = tf.GraphDef()
        gd.ParseFromString(f.read())

    nodes = {n.name: n for n in gd.node}

    def const_value(name):
        node = nodes[name.split(":")[0]]
        assert node.op in ("Const",), f"{name}: expected Const, got {node.op}"
        return tf.make_ndarray(node.attr["value"].tensor)

    expected = _expected_conv_units()
    params: dict = {}
    bn_ops = ("BatchNormWithGlobalNormalization", "FusedBatchNorm", "FusedBatchNormV3")
    for n in gd.node:
        if n.op not in bn_ops:
            continue
        conv_name = n.input[0].split(":")[0]
        conv = nodes[conv_name]
        if conv.op == "CheckNumerics":
            conv_name = conv.input[0].split(":")[0]
            conv = nodes[conv_name]
        assert conv.op == "Conv2D", f"{n.name}: BN input is {conv.op}, not Conv2D"
        w = const_value(conv.input[1])  # HWIO already (TF layout)
        if n.op == "BatchNormWithGlobalNormalization":
            mean, var, beta, gamma = (const_value(i) for i in n.input[1:5])
            eps = n.attr["variance_epsilon"].f
            if not n.attr["scale_after_normalization"].b:
                gamma = np.ones_like(mean)
        else:  # FusedBatchNorm input order: x, gamma, beta, mean, var
            gamma, beta, mean, var = (const_value(i) for i in n.input[1:5])
            eps = n.attr["epsilon"].f
        s = gamma / np.sqrt(var + eps)
        prefix = conv_name.rsplit("/", 1)[0] if "/" in conv_name else conv_name
        spec = expected.get(prefix)
        if spec is None:
            print(f"WARNING: unexpected conv scope {prefix!r} (shape {w.shape}) — skipped")
            continue
        kh, kw, _, _, out_ch = spec
        assert w.shape[:2] == (kh, kw) and w.shape[3] == out_ch, (
            f"{prefix}: pb weight {w.shape} != expected ({kh},{kw},?,{out_ch})"
        )
        params[prefix] = {
            "w": (w * s[None, None, None, :]).astype(np.float32),
            "b": (beta - mean * s).astype(np.float32),
        }
        if prefix == "mixed_6/conv":
            # Keep the pre-BN-fold weight around: if the pb's mixed_6/conv:0
            # tensor turns out to be the raw Conv2D output, the forward pass
            # needs the unfolded kernel to reproduce it (sFID features).
            unfolded_mixed6_w = w.astype(np.float32)

    missing = sorted(set(expected) - set(params))
    assert not missing, f"pb conversion missing conv units: {missing}"

    # IS softmax weight (no bias — matches the reference's softmax graph)
    for n in gd.node:
        if n.name == "softmax/logits/MatMul":
            params["softmax_w"] = const_value(n.input[1]).astype(np.float32)
    assert "softmax_w" in params, "softmax/logits/MatMul weight not found in pb"

    # Record whether the tensor named mixed_6/conv:0 is the raw Conv2D output
    # or the post-BN/ReLU output, so the forward pass reproduces it exactly.
    sp_node = nodes.get("mixed_6/conv")
    pre_act = sp_node is not None and sp_node.op == "Conv2D"
    params["spatial_pre_activation"] = np.asarray(pre_act)
    if pre_act:
        # forward needs the unfolded kernel to reproduce the raw Conv2D
        # output (the folded 'w' above is scaled per-channel by BN)
        params["mixed_6/conv_raw"] = {
            "w": unfolded_mixed6_w,
            "b": np.zeros(unfolded_mixed6_w.shape[-1], np.float32),
        }

    flat = {}
    for k, v in params.items():
        if isinstance(v, dict):
            flat[f"{k}//w"] = v["w"]
            flat[f"{k}//b"] = v["b"]
        else:
            flat[k] = v
    np.savez(out_path, **flat)
    print(f"wrote {out_path} ({len(params) - 2} conv units)")
    return params


def load_params(npz_path: str) -> tuple[dict, bool]:
    """-> (params pytree for inception_features, spatial_pre_activation flag).

    The flag is returned separately because it is a static branch selector,
    not a traced array.
    """
    obj = np.load(npz_path)
    params: dict = {}
    for k in obj.files:
        if "//" in k:
            prefix, leaf = k.split("//")
            params.setdefault(prefix, {})[leaf] = obj[k]
        else:
            params[k] = obj[k]
    flag = bool(params.pop("spatial_pre_activation", False))
    return params, flag


def random_params(seed: int = 0) -> dict:
    """Architecture-shaped random params (for tests without the pb)."""
    rs = np.random.RandomState(seed)
    units = _expected_conv_units()
    params: dict = {}
    chans = _trace_in_channels()  # input channels via the concat structure
    for name, (kh, kw, s, p, out_ch) in units.items():
        cin = chans[name]
        params[name] = {
            "w": (rs.standard_normal((kh, kw, cin, out_ch)) * (1.0 / np.sqrt(kh * kw * cin))).astype(np.float32),
            "b": np.zeros(out_ch, np.float32),
        }
    params["softmax_w"] = (rs.standard_normal((2048, 1008)) * 0.02).astype(np.float32)
    return params


def _trace_in_channels() -> dict:
    """Input channel count of every conv unit, from the concat structure."""
    units = _expected_conv_units()
    cin: dict = {}

    def chain(names, start):
        c = start
        for n in names:
            cin[n] = c
            c = units[n][4]
        return c

    c = 3
    c = chain(["conv", "conv_1", "conv_2"], c)
    c = chain(["conv_3", "conv_4"], c)
    for name, proj in (("mixed", 32), ("mixed_1", 64), ("mixed_2", 64)):
        outs = [
            chain([f"{name}/conv"], c),
            chain([f"{name}/tower/conv", f"{name}/tower/conv_1"], c),
            chain([f"{name}/tower_1/conv", f"{name}/tower_1/conv_1", f"{name}/tower_1/conv_2"], c),
            chain([f"{name}/tower_2/conv"], c),
        ]
        c = sum(outs)
    outs = [
        chain(["mixed_3/conv"], c),
        chain(["mixed_3/tower/conv", "mixed_3/tower/conv_1", "mixed_3/tower/conv_2"], c),
        c,  # max pool branch
    ]
    c = sum(outs)
    for name in ("mixed_4", "mixed_5", "mixed_6", "mixed_7"):
        outs = [
            chain([f"{name}/conv"], c),
            chain([f"{name}/tower/conv", f"{name}/tower/conv_1", f"{name}/tower/conv_2"], c),
            chain([f"{name}/tower_1/conv", f"{name}/tower_1/conv_1", f"{name}/tower_1/conv_2",
                   f"{name}/tower_1/conv_3", f"{name}/tower_1/conv_4"], c),
            chain([f"{name}/tower_2/conv"], c),
        ]
        c = sum(outs)
    outs = [
        chain(["mixed_8/tower/conv", "mixed_8/tower/conv_1"], c),
        chain(["mixed_8/tower_1/conv", "mixed_8/tower_1/conv_1",
               "mixed_8/tower_1/conv_2", "mixed_8/tower_1/conv_3"], c),
        c,  # max pool branch
    ]
    c = sum(outs)
    for name in ("mixed_9", "mixed_10"):
        b0 = chain([f"{name}/conv"], c)
        t = chain([f"{name}/tower/conv"], c)
        t_out = chain([f"{name}/tower/mixed/conv"], t) + chain([f"{name}/tower/mixed/conv_1"], t)
        t1 = chain([f"{name}/tower_1/conv"], c)
        t1 = chain([f"{name}/tower_1/conv_1"], t1)
        t1_out = chain([f"{name}/tower_1/mixed/conv"], t1) + chain([f"{name}/tower_1/mixed/conv_1"], t1)
        pool_out = chain([f"{name}/tower_2/conv"], c)
        c = b0 + t_out + t1_out + pool_out
    assert c == 2048, f"trunk output channels {c} != 2048"
    return cin


DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "inception_v3_fid.npz"
)


def find_converted_weights() -> str | None:
    cand = os.environ.get("INCEPTION_FLAX_NPZ", DEFAULT_WEIGHTS)
    return cand if os.path.exists(cand) else None


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "convert":
        convert_pb(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else DEFAULT_WEIGHTS)
    else:
        print(__doc__)
