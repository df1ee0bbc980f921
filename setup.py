from setuptools import find_packages, setup

setup(
    name="guided-diffusion-clip-tpu",
    version="0.1.0",
    description="TPU-native JAX framework with the capabilities of guided-diffusion-clip",
    packages=find_packages(include=["guided_diffusion_clip_tpu*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
        "Pillow",
        "PyYAML",
    ],
    extras_require={
        "torch-interop": ["torch"],
        "eval-inception": ["tensorflow", "scipy"],
    },
)
