"""Sampling-script helpers (utils/sample_util.py).

`overlap_device_host` is the pipelining primitive behind every sampling CLI:
batch k's host IO must run AFTER batch k+1 is dispatched (that's the overlap)
but results must still be processed exactly once, in order.
"""

from guided_diffusion_clip_tpu.utils.sample_util import (
    add_delta_imgimg,
    overlap_device_host,
)


class TestOverlapDeviceHost:
    def test_processes_all_in_order(self):
        out = []
        overlap_device_host(iter(range(5)), out.append)
        assert out == [0, 1, 2, 3, 4]

    def test_empty_iterator(self):
        out = []
        overlap_device_host(iter(()), out.append)
        assert out == []

    def test_single_item(self):
        out = []
        overlap_device_host(iter([7]), out.append)
        assert out == [7]

    def test_overlap_depth_one(self):
        # process(k) must happen after dispatch(k+1): that's the pipeline
        events = []

        def dispatched():
            for i in range(3):
                events.append(("dispatch", i))
                yield i

        overlap_device_host(dispatched(), lambda i: events.append(("process", i)))
        assert events == [
            ("dispatch", 0),
            ("dispatch", 1),
            ("process", 0),
            ("dispatch", 2),
            ("process", 1),
            ("process", 2),
        ]

    def test_exception_in_dispatch_does_not_double_process(self):
        out = []

        def dispatched():
            yield 0
            yield 1
            raise RuntimeError("loader died")

        try:
            overlap_device_host(dispatched(), out.append)
        except RuntimeError:
            pass
        assert out == [0]  # item 1 was in flight; nothing processed twice


class TestAddDeltaImgimg:
    def test_clip_feat2_defaults_to_clip_feat(self):
        kw = add_delta_imgimg({"clip_feat": "A"})
        assert kw["clip_feat2"] == "A"

    def test_existing_clip_feat2_kept(self):
        kw = add_delta_imgimg({"clip_feat": "A", "clip_feat2": "B"})
        assert kw["clip_feat2"] == "B"

    def test_input_not_mutated(self):
        src = {"clip_feat": "A"}
        add_delta_imgimg(src)
        assert "clip_feat2" not in src
