"""Engine operators, each a declarative DataFrame transformation.

Modules mirror the reference's operator inventory (SURVEY.md §2) re-expressed
Spark-first; docstrings cite the reference behavior they reproduce.
"""
