"""Domain ETL parity layer.

Re-implements the reference's cybersecurity integration pipeline
(karinakanjaria/cyber-etl) Spark-first: each stage is a pure
DataFrame→DataFrame function; external ingest (HTTP scrape, GitHub REST)
is modeled as bronze fixtures — the engine boundary starts at bronze
(SURVEY.md §7.3 hard part 6).
"""

from .nvd import cve_nodes, cve_references, cpe_nodes, filter_relevant_cves  # noqa: F401
from .alerts import alert_nodes, alert_cve_edges, alert_ttp_edges  # noqa: F401
from .mitre import mitre_techniques  # noqa: F401
from .github import github_language_edges, github_user_edges  # noqa: F401
