"""(populated in later milestones this round)"""
