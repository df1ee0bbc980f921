"""Sampling-script helpers.

RECONSTRUCTED: the reference star-imports `guided_diffusion.sample_util` in
image_sample.py:25, image_sample_repeat.py:25 and
super_res_depth_sweep_sample.py:25, but never ships the module
(SURVEY.md §0.1). Semantics are inferred from the call sites.
"""

from __future__ import annotations

import numpy as np


def overlap_device_host(dispatched, process):
    """Pipeline host IO behind device compute, one batch deep.

    `dispatched` yields items whose device arrays have just been dispatched
    asynchronously (NOT synced); `process(item)` does the host-side work
    (np.asarray sync, uint8 convert, PNG/npz writes, host all-gather). Each
    batch's host work overlaps the NEXT batch's on-device chain — JAX's async
    dispatch queues the next chain before the previous result is fetched.
    The reference loop (image_sample.py:96-118) serializes these; on TPU the
    PNG/gather time would otherwise be dead device time between chains.
    """
    prev = _SENTINEL = object()
    for item in dispatched:
        if prev is not _SENTINEL:
            process(prev)
        prev = item
    if prev is not _SENTINEL:
        process(prev)


def add_delta_imgimg(kwargs: dict) -> dict:
    """Stage the kwargs dict for the delta-conditioned SR model.

    Inferred from image_sample.py:72-80: runs on the raw data-loader kwargs
    before `img2` is staged; must guarantee the keys the SRImageModel_Feat
    forward consumes (clip_feat, clip_feat2, img2) exist — datasets without an
    explicit partner fall back to the identity pairing (delta = bias only).
    """
    kwargs = dict(kwargs)
    if "clip_feat" in kwargs and "clip_feat2" not in kwargs:
        kwargs["clip_feat2"] = kwargs["clip_feat"]
    if "img2" not in kwargs and "clip_feat" in kwargs:
        pass  # base models don't need img2; SR scripts stage it explicitly
    return kwargs


def process1(kwargs: dict) -> dict:
    """Depth-sweep kwargs staging (super_res_depth_sweep_sample.py:69).

    Inferred: normalize the loader kwargs like add_delta_imgimg and pin the
    partner image as the denoise starting point, so every depth in the sweep
    denoises the same reference content.
    """
    kwargs = add_delta_imgimg(kwargs)
    return kwargs
