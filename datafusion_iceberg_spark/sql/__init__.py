"""Hand-written SQL front end for the catalog's DML/DDL surface.

The reference delegates statement parsing to DataFusion's full SQL
parser (``datafusion_iceberg/src/table.rs:106-108``) and therefore
never carries regex-misparse risk.  This package is the Spark-side
equivalent: a real tokenizer (:mod:`.lexer`) and a recursive-descent
parser (:mod:`.parser`) over the token stream, producing typed
statement ASTs (:mod:`.ast_nodes`) that the executor maps onto the
catalog write path.  Expression positions (predicates, SET values,
SELECT bodies) are captured as *verbatim source spans* bounded by the
grammar — Spark SQL evaluates them — so the parser owns statement
STRUCTURE (where strings, comments, nesting, and keywords live) while
Catalyst owns expression semantics.
"""

from datafusion_iceberg_spark.sql.lexer import Token, tokenize
from datafusion_iceberg_spark.sql.parser import ParseError, parse_statement

__all__ = ["Token", "tokenize", "ParseError", "parse_statement"]
