"""Run state: per-partition lineage records + resumable writes."""
