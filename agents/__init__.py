"""Competition-facing user controllers (reference user_controller/)."""

from agents.base import BaseController

__all__ = ["BaseController"]
