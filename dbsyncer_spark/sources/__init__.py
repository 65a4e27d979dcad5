from dbsyncer_spark.sources.fileio import format_lines, parse_lines, read_split_file, write_split_file

__all__ = ["format_lines", "parse_lines", "read_split_file", "write_split_file"]
