"""Offline tools: descriptor precompute, dataset builders, analysis.

Reference parity (SURVEY.md P17, D12):
- misc/cal_fcgf.py / cal_fpfh.py -> precompute_descriptors.py
- scripts/analyze_stats.py      -> analyze_stats.py
"""
