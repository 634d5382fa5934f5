"""Compiler layer (SURVEY §1 L4): normalized AST -> executable device plan."""

from trinity_tpu.plan.compile import CompiledPlan, compile_plan

__all__ = ["CompiledPlan", "compile_plan"]
