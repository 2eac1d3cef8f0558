"""Custom sources beyond stock readers (SURVEY.md §2.1).

obo — OBO ontology flat files (S6): distributed stanza reader.
"""
