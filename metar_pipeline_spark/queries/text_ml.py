"""Training-data-pipeline operators: dedup / similarity / text analysis.

Populated incrementally — see operators/dedup.py, operators/similarity.py,
operators/textops.py.
"""
