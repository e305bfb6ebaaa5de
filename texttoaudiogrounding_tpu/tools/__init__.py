"""Offline data tooling (reference utils/data/, python_scripts/clustering/).

Standalone host-side CLIs that produce/consume the framework's artifacts:
waveform packing, phrase parsing, label manipulation, phrase-embedding
extraction, clustering, phrase→event mapping.
"""
