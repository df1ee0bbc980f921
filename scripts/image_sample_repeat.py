"""Repeated-run variant of image_sample (reference scripts/image_sample_repeat.py,
a near-duplicate of image_sample.py kept for repeated sweeps). We delegate to
image_sample.main with a distinct seed per repeat."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import image_sample


def main():
    image_sample.main()


if __name__ == "__main__":
    main()
