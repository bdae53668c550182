"""Relational operator library: the reference's implicit relational algebra
(SURVEY.md §2.6) re-expressed as reusable DataFrame builders."""
