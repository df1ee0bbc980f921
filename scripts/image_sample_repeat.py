"""Repeated sampling runs (reference scripts/image_sample_repeat.py — a
near-duplicate of image_sample.py kept for repeated sweeps).

Runs image_sample.main() `--repeats` times with distinct seeds, each into its
own run directory (the timestamped logger dir keeps them apart).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import image_sample


def main():
    argv = list(sys.argv[1:])
    repeats = 1
    if "--repeats" in argv:
        i = argv.index("--repeats")
        repeats = int(argv[i + 1])
        del argv[i : i + 2]
    base_seed = 0
    if "--seed" in argv:
        i = argv.index("--seed")
        base_seed = int(argv[i + 1])
        del argv[i : i + 2]
    desc = ""
    for flag in ("-d", "--description"):
        if flag in argv:
            i = argv.index(flag)
            desc = argv[i + 1]
            del argv[i : i + 2]
    for r in range(repeats):
        # per-repeat description so run dirs never collide (the timestamped
        # dir name has 1s resolution; fast repeats would overwrite each other)
        rep_desc = f"{desc}_rep{r}" if desc else f"rep{r}"
        sys.argv = [sys.argv[0]] + argv + ["--seed", str(base_seed + r), "-d", rep_desc]
        image_sample.main()
        # reset the logger so each repeat gets a fresh timestamped run dir
        from guided_diffusion_clip_tpu.utils import logger

        logger.reset()


if __name__ == "__main__":
    main()
