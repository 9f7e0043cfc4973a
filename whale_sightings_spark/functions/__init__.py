"""Scalar function library (SURVEY.md §2.8): dates, text, hashing, vectors."""
