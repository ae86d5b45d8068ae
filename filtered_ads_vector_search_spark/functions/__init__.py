"""Expression library (SURVEY.md §2 C): vector, text, and portable hashing."""

from . import hashing, text, vector

__all__ = ["hashing", "text", "vector"]
