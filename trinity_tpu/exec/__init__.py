"""Execution engine (SURVEY §1 L5): the TPU replacement for exec.cpp."""

from trinity_tpu.exec.executor import ExecFlags, Executor, SearchResult

__all__ = ["Executor", "ExecFlags", "SearchResult"]
