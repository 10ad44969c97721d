"""Frontier: seen-set, politeness scheduler, round loop, reference simulator."""
