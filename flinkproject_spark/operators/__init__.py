"""Operator library — one documented function per SURVEY.md §2 inventory row.

Each operator is a pure DataFrame -> DataFrame transformation (no collect(),
no driver-side loops) so it composes into batch or streaming plans and
Catalyst can optimize across operator boundaries.
"""
