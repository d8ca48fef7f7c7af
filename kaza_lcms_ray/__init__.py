"""kaza_lcms_ray — a Ray-Data-native spatial-join + tiling engine.

Built from scratch with the query capabilities of sig-gis/kaza-lcms
(reference at /root/reference), re-expressed Ray-Data-first: Dataset
pipelines over zero-copy Arrow batches, actor pools for stateful spatial
indexes, two-phase shuffles keyed on an S2-style cell index.
"""
