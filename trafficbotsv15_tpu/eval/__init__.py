"""Evaluation: error/rule metrics, WOMD/WOSAC post-processing, submissions."""
