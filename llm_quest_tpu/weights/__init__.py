"""HF-checkpoint interop: download, name remapping, loading into param pytrees."""
