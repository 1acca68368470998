-- Sample ad-hoc queries for the replayed CDC state table.
-- Run after a replay completes:
--   python scripts/table_tool.py --table /path/to/state sql --file sql/sample_queries.sql
-- The table is registered as temp view `state`
-- (repo, path, commit, lang, content, content_sha256, last_seq).
--
-- Shapes mirror the reference's sql/sample_queries.sql surface
-- (/root/reference/sql/sample_queries.sql: raw exploration, grouped
-- counts, top-N with count-distinct, LIKE trend slices, TO_CHAR-formatted
-- reports, CASE classification CTEs) re-targeted at the source-code
-- repository domain.

-- ========================================
-- RAW EXPLORATION
-- ========================================

-- Check one row's structure
SELECT repo, path, lang, substr(content, 1, 40) AS content_head, last_seq
FROM state
LIMIT 1;

-- Row counts by language
SELECT lang, COUNT(*) AS file_count
FROM state
GROUP BY 1
ORDER BY 2 DESC, 1;

-- ========================================
-- REPO-LEVEL ANALYTICS
-- ========================================

-- Top 10 repos by language diversity, with average file size
SELECT
    repo,
    COUNT(DISTINCT lang) AS lang_count,
    COUNT(*) AS files,
    ROUND(AVG(length(content)), 2) AS avg_content_len
FROM state
GROUP BY 1
ORDER BY 2 DESC, 3 DESC, 1
LIMIT 10;

-- Churn trend for one directory family
SELECT
    lang,
    COUNT(*) AS files,
    MAX(last_seq) AS latest_seq,
    COUNT(DISTINCT repo) AS repos_touching
FROM state
WHERE path LIKE 'src/dir_1/%'
GROUP BY 1
ORDER BY 1;

-- ========================================
-- FORMATTED REPORT (TO_CHAR analogue)
-- ========================================

SELECT
    lang,
    format_number(COUNT(*), 0) AS files_formatted,
    format_number(SUM(length(content)), 0) AS bytes_formatted,
    CASE
        WHEN COUNT(*) > 1000 THEN CONCAT(unhex('E28691'), ' major')
        WHEN COUNT(*) > 100 THEN CONCAT(unhex('E28692'), ' steady')
        ELSE CONCAT(unhex('E28693'), ' minor')
    END AS volume_trend
FROM state
GROUP BY 1
ORDER BY COUNT(*) DESC, 1;

-- ========================================
-- CLASSIFICATION CTE
-- ========================================

WITH repo_profile AS (
    SELECT
        repo,
        COUNT(*) AS files,
        COUNT(DISTINCT lang) AS langs,
        CASE
            WHEN COUNT(DISTINCT lang) >= 4 THEN 'polyglot'
            WHEN COUNT(DISTINCT lang) >= 2 THEN 'mixed'
            ELSE 'single-language'
        END AS repo_class
    FROM state
    GROUP BY 1
)
SELECT repo_class, COUNT(*) AS repos, ROUND(AVG(files), 2) AS avg_files
FROM repo_profile
GROUP BY 1
ORDER BY 2 DESC, 1;

-- ========================================
-- SELF-JOIN: hot files present in the most repos
-- ========================================

SELECT s.path, COUNT(DISTINCT s.repo) AS repos, MIN(s.lang) AS lang
FROM state s
JOIN (
    SELECT path FROM state GROUP BY path HAVING COUNT(DISTINCT repo) > 1
) hot ON s.path = hot.path
GROUP BY s.path
ORDER BY repos DESC, s.path
LIMIT 10;
