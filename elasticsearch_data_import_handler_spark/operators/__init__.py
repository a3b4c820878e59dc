"""Engine-native operators (SURVEY.md §2C) + training-data pipeline ops."""
