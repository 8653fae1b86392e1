"""Scalar and table functions.

``wikitext`` is the one irreducible Python function (template extraction,
reference ``src/helpers/template_extraction.py``); everything else in this
package builds Catalyst-native Column expressions.
"""
