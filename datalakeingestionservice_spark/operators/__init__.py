"""Reusable high-level operators (dedup, similarity, multimodal, text).

Library form of the extension operators: `queries/` exposes them to the
correctness harness; these functions are the composable API surface.
"""
