"""Operator library: aggregators, reshape, joins, and the large-scale
extension operators (dedup, similarity, text, multimodal)."""
