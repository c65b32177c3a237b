"""Test configuration: force an 8-device CPU JAX platform before jax imports.

Mirrors the distributed-tier strategy in SURVEY.md §4: sharding/collective tests
run on a virtual 8-device CPU mesh and must work unchanged on real TPU meshes.
"""

import os

# The image pre-imports jax via sitecustomize with JAX_PLATFORMS=axon (TPU
# tunnel), so env vars alone are too late; use jax.config to force the test
# tier onto an 8-device virtual CPU platform (SURVEY.md §4). XLA_FLAGS is
# still honored because backends initialize lazily.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
import pathlib

import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def _text_like(rng: np.random.Generator, n: int) -> bytes:
    """English-ish text: skewed byte distribution + repeated phrases."""
    words = [
        b"the ", b"quick ", b"brown ", b"fox ", b"jumps ", b"over ", b"lazy ",
        b"dog. ", b"compression ", b"suffix ", b"array ", b"factor ",
        b"a ", b"of ", b"and ", b"to ", b"in ", b"\n",
    ]
    out = bytearray()
    while len(out) < n:
        out += words[int(rng.integers(len(words)))]
    return bytes(out[:n])


def _repetitive(rng: np.random.Generator, n: int) -> bytes:
    motif = bytes(rng.integers(0, 256, size=max(2, n // 50), dtype=np.uint8))
    out = bytearray()
    while len(out) < n:
        out += motif
        if rng.random() < 0.3:
            out += bytes(rng.integers(0, 256, size=3, dtype=np.uint8))
    return bytes(out[:n])


CORPUS_KINDS = ("random", "text", "repetitive", "zeros", "runs", "alternating")


def make_corpus(kind: str, n: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    if kind == "random":
        return bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
    if kind == "text":
        return _text_like(rng, n)
    if kind == "repetitive":
        return _repetitive(rng, n)
    if kind == "zeros":
        return bytes(n)
    if kind == "runs":
        out = bytearray()
        while len(out) < n:
            out += bytes([int(rng.integers(0, 4))]) * int(rng.integers(1, 40))
        return bytes(out[:n])
    if kind == "alternating":
        return (b"ab" * ((n + 1) // 2))[:n]
    raise ValueError(kind)


@pytest.fixture(scope="session")
def corpus():
    return make_corpus
