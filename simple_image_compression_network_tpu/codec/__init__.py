"""Codec stack: entropy models, rANS coder, bitstream container, end-to-end
codecs (the capability layer the reference lacks — SURVEY.md §0)."""

from . import container, entropy, rans  # noqa: F401
