"""Ray Data stage builders.

The pipeline is deliberately a LINEAR DAG:

    read -> prepare (explode + text/html extract + pdf page fan-out)
         -> ocr (actor pool; media rows only, text rows pass through)
         -> salted partial merge (optional groupby)
         -> stitch (groupby doc_id)
         -> write

Branching a Ray Data Dataset re-executes upstream stages per consumer
(no common-subexpression sharing), so kind-routing is done WITHIN
stages (vectorized masks / per-row dispatch) rather than with
filter+union fan-out — one pass over the stream, no recompute.
"""
