"""Training-data pipeline functions: dedup, similarity, text, events, multimodal."""
