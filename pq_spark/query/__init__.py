from .ast import (
    AggregateOperation,
    BinaryOperation,
    Expr,
    FunctionCall,
    LabelMatcher,
    NumberLiteral,
    Parentheses,
    UnaryOperation,
    VectorSelector,
)
from .parser import parse_expr

__all__ = [
    "AggregateOperation",
    "BinaryOperation",
    "Expr",
    "FunctionCall",
    "LabelMatcher",
    "NumberLiteral",
    "Parentheses",
    "UnaryOperation",
    "VectorSelector",
    "parse_expr",
]
