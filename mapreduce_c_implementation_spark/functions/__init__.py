from mapreduce_c_implementation_spark.functions.text import (  # noqa: F401
    TOKEN_DELIM_REGEX,
    tokenize,
)
