"""Multimodal stack: ViT→LLM adapters, early-fusion VLM, Qwen3.5 VLM wiring."""
