"""Offline one-shot tools (re-design of the reference's scripts/ and
dataset/src/scripts/): depth-GT precompute, OpenPCDet export, nuScenes
info-pkl generation."""
