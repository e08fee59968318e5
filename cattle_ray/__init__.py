"""cattle_ray — Ray-Data-native knowledge-graph construction engine.

From-scratch reimplementation of CLARIAH/cattle's CSVW→RDF capabilities
(reference read-only at /root/reference; see SURVEY.md for the operator
inventory and COVERAGE.md for the line-by-line map), generalized to a
web-scale triple factory per BASELINE.json's north_star.

Public surface:

    from cattle_ray.pipelines.kg import build_triples, csv_to_nquads
    from cattle_ray.pipelines.job import run_kg_job
    from cattle_ray.template import MappingTemplate
    from cattle_ray.infer import infer_metadata
    from cattle_ray.serialize import serialize_collected

Nothing in this package calls ``ray.init``; callers own the Ray session
(``bench.py``, ``cattle_ray.cli``, the test fixture).
"""

__version__ = "0.1.0"
