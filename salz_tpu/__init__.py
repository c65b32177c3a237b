"""salz-tpu: TPU-native suffix-array Lempel-Ziv compression framework.

Byte-compatible with the salz stream/container format of the reference C
implementation (akiutoslahti/salz). See README.md for the architecture and
FORMAT.md for the normative byte-format spec.

Heavyweight submodules (JAX pipeline, native codec) import lazily — importing
`salz_tpu` alone stays cheap.
"""

__version__ = "0.1.0"
