"""Composable pipeline plans (SURVEY.md §3.3, §7 Phase 3)."""
