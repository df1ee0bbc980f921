"""Shipped YAML presets must stay in sync with the CLI flag surface.

parse_yaml overlays keys onto args without validation (reference
script_util.py:465-477 semantics), so a stale/typo'd key in a shipped config
would silently do nothing. Pin each preset's keys to the target script's
argparser defaults.
"""

import os
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def _keys(name):
    with open(os.path.join(REPO, "configs", name)) as f:
        return set(yaml.safe_load(f))


def _flags(script_module):
    parser = script_module.create_argparser()
    return {a.dest for a in parser._actions}


def test_deploy256_fast_keys_are_classifier_sample_flags():
    import classifier_sample

    unknown = _keys("deploy256_fast.yaml") - _flags(classifier_sample)
    assert not unknown, f"deploy256_fast.yaml keys unknown to classifier_sample: {unknown}"


def test_sample_config_keys_are_image_sample_flags():
    import image_sample

    unknown = _keys("sample_config.yaml") - _flags(image_sample)
    assert not unknown, f"sample_config.yaml keys unknown to image_sample: {unknown}"


def test_image_sample_config_keys_are_image_sample_flags():
    import image_sample

    unknown = _keys("image_sample_config.yaml") - _flags(image_sample)
    assert not unknown, f"image_sample_config.yaml keys unknown to image_sample: {unknown}"


def test_train_config_keys_are_image_train_flags():
    import image_train

    unknown = _keys("config.yaml") - _flags(image_train)
    assert not unknown, f"config.yaml keys unknown to image_train: {unknown}"
