"""Structured Streaming surface — the reference's continuous-sync loop
(EP2) and the mandated streaming window operators."""
