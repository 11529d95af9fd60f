"""Query-surface facades (SURVEY §3.3): the PostgREST param-grammar
translator and the stored-procedure-as-view registry."""
