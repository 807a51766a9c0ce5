"""Problem I/O: QPS (Maros-Meszaros) format parsing and conversion."""

from .qps import QPSProblem, load_qps, parse_qps  # noqa: F401
