"""Scalar/array function layer shared by operators and oracle SQL builders."""
