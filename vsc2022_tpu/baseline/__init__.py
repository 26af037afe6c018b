"""Baseline pipeline drivers: SSCD/DINO matching, DnS two-stage."""
