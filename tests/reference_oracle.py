"""Optional numerical oracle: the PyTorch reference at /root/reference.

Tests that want bit-level parity against the reference import it at runtime
(never copying its code). All oracle tests skip cleanly when the reference
tree is absent, so the suite is self-contained elsewhere.
"""

import os
import sys

REFERENCE_PATH = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "guided_diffusion"))


def load_reference_gd():
    """Import the reference's gaussian_diffusion module (torch CPU)."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import guided_diffusion.gaussian_diffusion as gd  # noqa

    return gd


def load_reference_respace():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import guided_diffusion.respace as rs  # noqa

    return rs
