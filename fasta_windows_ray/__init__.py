"""fasta_windows_ray — a Ray-Data-native windowed streaming engine.

Reinterprets tolkit/fasta_windows' per-window sequence statistics as
event-time tumbling/sliding/session windows keyed by conv_id over Parquet
transcript tables. See SURVEY.md for the operator inventory and the
reference file:line citations.
"""

__version__ = "0.1.0"
