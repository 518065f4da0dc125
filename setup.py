"""Packaging (reference: `/root/reference/setup.py`)."""
from setuptools import find_packages, setup

setup(
    name="bbx",
    version="0.1.0",
    description="Block Blast on XLA: a TPU-native RL framework",
    packages=find_packages(include=["bbx", "bbx.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "numpy",
        "pyyaml",
    ],
    extras_require={
        "dev": ["pytest", "chex"],
        "gym": ["gymnasium"],
    },
    entry_points={
        "console_scripts": [
            "bbx-train=bbx.cli.train:main",
            "bbx-evaluate=bbx.cli.evaluate:main",
            "bbx-play=bbx.cli.play:main",
            "bbx-benchmark=bbx.cli.benchmark:main",
        ],
    },
)
