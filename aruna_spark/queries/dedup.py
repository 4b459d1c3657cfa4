"""Placeholder — queries registered in later milestones."""
