"""Structured Streaming ingestion — replaces the reference's SQS→DynamoDB
ingester (SURVEY.md §2.1 O18-O19, §3.3)."""
