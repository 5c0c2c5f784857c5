"""Alignment stack: DPO/cDPO, reward modeling, GRPO family, RLVR, RPT."""
