"""VietnamWorks + TopDev normalizer paths (normalizer.go:62-134, 253-309)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawlspark.normalize import normalize_topdev, normalize_vietnamworks

VNW_SCHEMA = """
 id string, source string, url string, crawled_at timestamp,
 job_title string, company_name string, job_description string,
 job_requirement string, address string, pretty_salary string,
 salary_min_vnd long, salary_max_vnd long, years_of_experience int,
 job_level_vi string, job_level string,
 benefits array<struct<benefit_value: string>>,
 working_locations array<struct<city_name_vi: string, address: string>>,
 skills array<struct<skill_name: string>>,
 industries_v3 array<struct<industry_name_vi: string, name: string>>,
 job_function struct<parent_name_vi: string, parent_name: string>
"""


def _vnw_row(**kw):
    base = dict(
        id="1", source="vietnamworks", url="https://vnw/1", crawled_at=None,
        job_title="Kỹ sư &amp; DevOps", company_name="ACME", job_description="mô tả",
        job_requirement="yêu cầu", address="", pretty_salary=None,
        salary_min_vnd=0, salary_max_vnd=0, years_of_experience=0,
        job_level_vi="", job_level="Senior",
        benefits=[{"benefit_value": "Bảo hiểm"}, {"benefit_value": ""}],
        working_locations=[{"city_name_vi": "Hà Nội", "address": "1 Phố X"},
                           {"city_name_vi": "", "address": "2 Phố Y"}],
        skills=[{"skill_name": "Python"}, {"skill_name": "SQL"}],
        industries_v3=[{"industry_name_vi": "CNTT", "name": "IT"},
                       {"industry_name_vi": "", "name": "Fallback"}],
        job_function={"parent_name_vi": "Kỹ thuật", "parent_name": "Engineering"},
    )
    base.update(kw)
    return base


def _run_vnw(spark, rows):
    df = spark.createDataFrame(rows, VNW_SCHEMA)
    return normalize_vietnamworks(df).collect()


class TestVietnamWorks:
    def test_nested_pulls_and_unescape(self, spark):
        r = _run_vnw(spark, [_vnw_row()])[0]
        assert r["title"] == "Kỹ sư & DevOps"            # N15 unescape
        assert r["benefits"] == "Bảo hiểm"               # N13 filter empties
        assert r["location"] == "1 Phố X; 2 Phố Y"       # addresses joined
        assert list(r["location_city"]) == ["Hà Nội"]    # empties dropped
        assert r["field"] == "Python, SQL"
        assert list(r["industry"]) == ["CNTT", "Fallback"]  # nameVi else name
        assert r["position"] == "Senior"                 # jobLevelVI || jobLevel

    def test_job_function_fallback(self, spark):
        r = _run_vnw(spark, [_vnw_row(industries_v3=[])])[0]
        assert list(r["industry"]) == ["Kỹ thuật"]

    def test_salary_chain(self, spark):
        # prettySalary wins + negotiable term detection
        r = _run_vnw(spark, [_vnw_row(pretty_salary="Lương cạnh tranh")])[0]
        assert r["salary"] == "Lương cạnh tranh" and r["is_negotiable"]
        # VND -> millions BEFORE display; max<999 guard passes
        r = _run_vnw(spark, [_vnw_row(salary_min_vnd=10_000_000, salary_max_vnd=20_000_000)])[0]
        assert (r["salary"], r["salary_min"], r["salary_max"]) == ("10 - 20 triệu", 10, 20)
        assert r["is_negotiable"] is False
        # max >= 999 after conversion -> falls to "Trên"
        r = _run_vnw(spark, [_vnw_row(salary_min_vnd=10_000_000, salary_max_vnd=999_000_000)])[0]
        assert r["salary"] == "Trên 10 triệu"
        # nothing -> Thỏa thuận + RESET of min/max (normalizer.go:106-109)
        r = _run_vnw(spark, [_vnw_row()])[0]
        assert (r["salary"], r["salary_min"], r["salary_max"], r["is_negotiable"]) == \
            ("Thỏa thuận", 0, 0, True)

    def test_experience_years_table(self, spark):
        r = _run_vnw(spark, [_vnw_row(years_of_experience=4)])[0]
        assert r["experience"] == "4 năm" and list(r["experience_tags"]) == ["D"]
        # years 0 -> empty experience -> top-level default A..F
        r = _run_vnw(spark, [_vnw_row(years_of_experience=0)])[0]
        assert r["experience"] == "" and list(r["experience_tags"]) == list("ABCDEF")


TD_SCHEMA = """
 id string, source string, url string, crawled_at timestamp,
 title string, company string, description string, requirement string,
 salary_min_vnd long, salary_max_vnd long, salary_text string,
 experience string, level string, benefits array<string>,
 locations array<string>, skills array<string>
"""


def _td_row(**kw):
    base = dict(
        id="7", source="topdev", url="https://td/7", crawled_at=None,
        title="Backend Dev", company="TD Corp", description="d", requirement="r",
        salary_min_vnd=15_000_000, salary_max_vnd=30_000_000, salary_text=None,
        experience="2 năm", level="Middle",
        benefits=["Tiền thưởng", "Du lịch"],
        locations=["12 Nguyễn Huệ, Quận 1, Hồ Chí Minh", "5 Tràng Thi, Hà Nội"],
        skills=["Go", "K8s"],
    )
    base.update(kw)
    return base


class TestTopDev:
    def test_location_tail_split(self, spark):
        r = normalize_topdev(spark.createDataFrame([_td_row()], TD_SCHEMA)).first()
        assert r["location"] == "12 Nguyễn Huệ, Quận 1, Hồ Chí Minh; 5 Tràng Thi, Hà Nội"
        assert list(r["location_city"]) == ["Hồ Chí Minh", "Hà Nội"]  # N18

    def test_salary_and_negotiable_quirk(self, spark):
        r = normalize_topdev(spark.createDataFrame([_td_row()], TD_SCHEMA)).first()
        assert (r["salary"], r["salary_min"], r["salary_max"]) == ("15 - 30 triệu", 15, 30)
        # TopDev path NEVER sets IsNegotiable (normalizer.go:287-295)
        r2 = normalize_topdev(spark.createDataFrame(
            [_td_row(salary_min_vnd=0, salary_max_vnd=0)], TD_SCHEMA)).first()
        assert r2["salary"] == "Thỏa thuận" and r2["is_negotiable"] is False
        r3 = normalize_topdev(spark.createDataFrame(
            [_td_row(salary_text="Up to $3000")], TD_SCHEMA)).first()
        assert r3["salary"] == "Up to $3000"

    def test_fields_and_tags(self, spark):
        r = normalize_topdev(spark.createDataFrame([_td_row()], TD_SCHEMA)).first()
        assert r["benefits"] == "Tiền thưởng; Du lịch"
        assert r["field"] == "Go, K8s"
        assert list(r["experience_tags"]) == ["D", "E", "F"]  # N5 on "2 năm"
        assert r["position"] == "Middle"
