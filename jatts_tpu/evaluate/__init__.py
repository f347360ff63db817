"""Objective evaluation suite (MCD / F0RMSE / F0CORR / DDUR, CER, spk-sim)."""
