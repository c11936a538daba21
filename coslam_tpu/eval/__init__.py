"""Trajectory (ATE) and reconstruction (Acc/Comp/Ratio/Depth-L1) evaluation."""
