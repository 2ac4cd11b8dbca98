"""Importer-compat operators: the reference's file->graph surface,
re-expressed as DataFrame scans + projections (SURVEY.md §2.1-§2.3)."""

from graph_importer_spark.importer.edge_list import (  # noqa: F401
    import_edge_list,
    parse_edge_list,
)
from graph_importer_spark.importer.graphalytics import (  # noqa: F401
    get_property_graphalytics,
    graphalytics_files,
    import_graphalytics,
    read_graphalytics_edges,
    read_graphalytics_vertices,
)
from graph_importer_spark.importer.keys import (  # noqa: F401
    idx_to_smart_vertex,
    idx_to_vertex,
)
